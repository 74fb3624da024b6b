package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Randomized CDC laws against an in-memory reference: for arbitrary
  * snapshot pairs, `diff` must classify exactly the keys a map-compare
  * classifies, and `merge(old, diff-as-changes)` must reconstruct the
  * new snapshot — including null values on both sides.
  */
class CdcPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomSnapshot(rng: scala.util.Random, n: Int): Map[Long, Option[String]] =
    (1L to n.toLong).flatMap { id =>
      if (rng.nextDouble() < 0.7)
        Some(id -> (if (rng.nextDouble() < 0.2) None
                    else Some(s"v${rng.nextInt(5)}")))
      else None
    }.toMap

  test("diff matches a map-compare and merge(diff) reconstructs new, on random snapshots") {
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val oldM = randomSnapshot(rng, 30)
      val newM = randomSnapshot(rng, 30)
      val oldDf = oldM.toSeq.map { case (k, v) => (k, v) }.toDF("id", "v")
      val newDf = newM.toSeq.map { case (k, v) => (k, v) }.toDF("id", "v")

      val expected = (oldM.keySet ++ newM.keySet).flatMap { k =>
        (oldM.get(k), newM.get(k)) match {
          case (None, Some(_))              => Some(k -> "insert")
          case (Some(_), None)              => Some(k -> "delete")
          case (Some(a), Some(b)) if a != b => Some(k -> "update")
          case _                            => None
        }
      }.toMap

      val d = SnapshotDiff.diff(oldDf, newDf, Seq("id"))
      val got = d.select("id", "change").as[(Long, String)].collect().toMap
      assert(got == expected, s"trial $trial")

      val changes = d.select(col("id"), col("new_v").as("v"),
        when(col("change") === "delete", "delete").otherwise("upsert").as("op"))
      val merged = SnapshotDiff.merge(oldDf, changes, Seq("id"))
        .as[(Long, Option[String])].collect().toMap
      assert(merged == newM, s"trial $trial")
    }
  }
}
