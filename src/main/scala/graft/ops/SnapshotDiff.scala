package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff + merge: the two halves of incremental table
  * maintenance (change-data-capture without a table format).
  *
  * A 100 TB corpus is never rebuilt from scratch — each crawl/refresh
  * produces a new snapshot, and the pipeline needs (a) WHAT changed
  * (diff: feed downstream incremental dedup/indexing only the delta)
  * and (b) an UPSERT that folds a small change set into the big
  * snapshot without rewriting unchanged data semantics (merge).
  *
  * Scale shape:
  *  - `diff` is ONE hash shuffle of each side on the key (a full outer
  *    join); with both snapshots bucketed on the key (`ops/Bucketing`)
  *    it is shuffle-free. Column comparison is null-safe `<=>` on the
  *    shared non-key columns, evaluated inside codegen.
  *  - `merge` is an anti-join (current minus changed keys) plus a
  *    union; a change set is normally ≪ the snapshot, so Spark/AQE
  *    broadcasts the change keys and the big side NEVER shuffles —
  *    the property that makes daily upserts affordable at 100 TB.
  *
  * Reference scope note: the reference pipeline overwrites its outputs
  * wholesale (timestamped directories, Main.py:243-276); these
  * operators are part of the training-data-pipeline extension surface.
  */
object SnapshotDiff {

  /** Row-level diff of two same-schema snapshots keyed by `keys`:
    * returns `keys ++ (change: insert|delete|update) ++ old_/new_`
    * copies of the non-key columns. Unchanged rows are dropped.
    * Keys must be non-null and unique per snapshot (the usual
    * snapshot-key contract; duplicate keys would multiply through the
    * join rather than error).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"snapshot schemas differ: ${oldDf.columns.mkString(",")} vs ${newDf.columns.mkString(",")}")
    val vals = oldDf.columns.filterNot(keys.contains).toSeq
    // presence flags rather than null checks: non-key columns may be
    // legitimately null, only the flag distinguishes absent from null
    val o = oldDf.select(
      keys.map(col) ++ vals.map(c => col(c).as(s"old_$c")) :+ lit(true).as("__in_old"): _*)
    val n = newDf.select(
      keys.map(col) ++ vals.map(c => col(c).as(s"new_$c")) :+ lit(true).as("__in_new"): _*)
    val changed: Column = vals
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .withColumn("change",
        when(col("__in_old").isNull, "insert")
          .when(col("__in_new").isNull, "delete")
          .when(changed, "update"))
      .filter(col("change").isNotNull)
      .select(keys.map(col) ++ Seq(col("change")) ++
        vals.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** Apply a change set to a snapshot: rows of `changes` tagged
    * `opCol` = "upsert" replace/insert by key; "delete" removes the
    * key. Big side anti-joins the (small) change keys — broadcastable,
    * so the snapshot never shuffles. Every key present in `changes` is
    * removed first and only "upsert" rows re-added (an unknown op value
    * degrades to delete rather than duplicating a key); at most one
    * change row per key.
    */
  def merge(current: DataFrame, changes: DataFrame, keys: Seq[String],
      opCol: String = "op"): DataFrame = {
    val untouched = current.join(
      broadcast(changes.select(keys.map(col): _*).distinct()), keys, "left_anti")
    val upserts = changes.filter(col(opCol) === "upsert").drop(opCol)
      .select(current.columns.map(col): _*)
    untouched.unionByName(upserts)
  }
}
