package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Snapshot diff/merge contracts: classification of inserts/deletes/
  * updates (null-safe), unchanged rows dropped, and the round-trip law
  * `merge(old, diff(old,new)) == new` that ties the two operators.
  */
class SnapshotDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def oldDf = Seq(
    (1L, Option("a"), 10L),   // unchanged
    (2L, Option("b"), 20L),   // value update
    (3L, Option("c"), 30L),   // deleted
    (4L, None: Option[String], 40L) // null → value update
  ).toDF("id", "v", "n")

  private def newDf = Seq(
    (1L, Option("a"), 10L),
    (2L, Option("B"), 20L),
    (4L, Option("d"), 40L),
    (5L, Option("e"), 50L)    // insert
  ).toDF("id", "v", "n")

  test("diff classifies insert/delete/update and drops unchanged") {
    val d = SnapshotDiff.diff(oldDf, newDf, Seq("id"))
      .select("id", "change").as[(Long, String)].collect().toMap
    assert(d == Map(2L -> "update", 3L -> "delete", 4L -> "update", 5L -> "insert"))
  }

  test("diff carries old/new values side by side") {
    val r = SnapshotDiff.diff(oldDf, newDf, Seq("id"))
      .filter($"id" === 2L).select("old_v", "new_v").head()
    assert(r.getString(0) == "b" && r.getString(1) == "B")
  }

  test("null-safe compare: null == null is unchanged, null vs value is update") {
    val o = Seq((1L, None: Option[String]), (2L, None: Option[String])).toDF("id", "v")
    val n = Seq((1L, None: Option[String]), (2L, Option("x"))).toDF("id", "v")
    val d = SnapshotDiff.diff(o, n, Seq("id"))
      .select("id", "change").as[(Long, String)].collect().toMap
    assert(d == Map(2L -> "update"))
  }

  test("round trip: merge(old, diff-as-changes) == new") {
    val changes = SnapshotDiff.diff(oldDf, newDf, Seq("id"))
      .select(col("id"), col("new_v").as("v"), col("new_n").as("n"),
        when(col("change") === "delete", "delete").otherwise("upsert").as("op"))
    val merged = SnapshotDiff.merge(oldDf, changes, Seq("id"))
      .as[(Long, Option[String], Long)].collect().toSet
    val expected = newDf.as[(Long, Option[String], Long)].collect().toSet
    assert(merged == expected)
  }

  test("merge never shuffles the big side (broadcast anti-join in plan)") {
    val changes = Seq((3L, Option("z"), 99L, "upsert")).toDF("id", "v", "n", "op")
    val plan = SnapshotDiff.merge(oldDf, changes, Seq("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }
}
