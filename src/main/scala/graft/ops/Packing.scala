package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget packs — the
  * step that turns a filtered corpus into dataloader-ready training
  * bins. (Extracted from the q82 catalog query so the shard count is a
  * real knob instead of a constant.)
  *
  * Greedy streaming packing in deterministic (hash, id) order WITHIN a
  * shard: per-shard running token cumsum, pack = start-offset div
  * budget — a doc joins the pack where its start offset lands, so a
  * pack overflows its budget by at most one document (standard
  * streaming-packing semantics, same as T5/GPT data pipelines).
  *
  * Scale shape: ONE shuffle on the shard key; the window sort is
  * per-shard, never global. `nShards` bounds the parallelism of the
  * cumsum — at 100 TB set it so a shard's rows fit one task's sort
  * buffer (thousands of shards), not 16. The default scales with the
  * session's shuffle parallelism so the operator never degrades to a
  * handful of window tasks on a big cluster; pass an explicit value to
  * make output deterministic across deployments (shard membership, and
  * therefore pack ids, depend on it).
  */
object Packing {

  /** Pack assignment for `df`.
    *
    * @param id       unique tie-break column (deterministic order)
    * @param tokens   per-row token count (long)
    * @param hash     deterministic long hash driving shard assignment
    *                 and intra-shard order (content hash: co-locates
    *                 identical docs and is stable across re-partitions)
    * @param budget   token budget per pack
    * @param nShards  number of independent packing shards; <= 0 means
    *                 4× the session's shuffle parallelism
    * @return input columns + shard, n_tokens, pack_id
    */
  def packGreedy(
      df: DataFrame,
      id: Column,
      tokens: Column,
      hash: Column,
      budget: Long,
      nShards: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val shards: Long =
      if (nShards > 0) nShards.toLong
      else 4L * df.sparkSession.sessionState.conf.numShufflePartitions
    val w = Window.partitionBy(col("_shard")).orderBy(col("_h"), col("_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(id.as("_id"), tokens.cast("long").as("n_tokens"),
        hash.as("_h"))
      .withColumn("_shard", pmod(col("_h"), lit(shards)))
      .withColumn("_cum", sum(col("n_tokens")).over(w))
      .select(col("_id").as("doc_id"), col("_shard").as("shard"),
        col("n_tokens"),
        expr(s"(_cum - n_tokens) div $budget").as("pack_id"))
  }

  /** [[packGreedy]] plus the dataloader-facing manifest column: each
    * document's token OFFSET inside its pack (where its tokens start
    * when the pack is concatenated in packing order). Same single
    * shard-key exchange and per-shard window — the offset is the same
    * running cumsum packGreedy already computes, reduced mod the pack
    * start (`start - pack_id·budget`), so the manifest costs nothing
    * extra. A trainer consumes exactly (shard, pack_id, offset):
    * that triple IS the epoch's storage layout.
    */
  def packManifest(
      df: DataFrame,
      id: Column,
      tokens: Column,
      hash: Column,
      budget: Long,
      nShards: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val shards: Long =
      if (nShards > 0) nShards.toLong
      else 4L * df.sparkSession.sessionState.conf.numShufflePartitions
    val w = Window.partitionBy(col("_shard")).orderBy(col("_h"), col("_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(id.as("_id"), tokens.cast("long").as("n_tokens"),
        hash.as("_h"))
      .withColumn("_shard", pmod(col("_h"), lit(shards)))
      .withColumn("_cum", sum(col("n_tokens")).over(w))
      .select(col("_id").as("doc_id"), col("_shard").as("shard"),
        col("n_tokens"),
        expr(s"(_cum - n_tokens) div $budget").as("pack_id"),
        expr(s"(_cum - n_tokens) - ((_cum - n_tokens) div $budget) * $budget")
          .as("offset_tokens"))
  }
}
