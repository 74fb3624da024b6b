package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partition-count invariance: a distributed result must not depend on
  * how it was parallelized. The DuckDB oracle already proves
  * engine-independence; this pins LAYOUT-independence — the property
  * that breaks when an operator leans on collect_list order, first()
  * without a frame, or zipWithIndex without a defined sort. Each query
  * runs under 5 and 32 shuffle partitions and must produce identical
  * row multisets. The picked queries are the order-sensitivity
  * hotspots: global index assignment, weighted sampling, packing,
  * sequence construction, hash splits, and the dedup verdict.
  */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rowsAt(name: String, parts: Int): Seq[Seq[Any]] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try SparkEntry.queries(name)(spark, dir).collect()
      .map(_.toSeq.map {
        case a: Array[_] => a.toSeq
        case v => v
      }).toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private val targets = Seq(
    "q111_corpus_shuffle",
    "q116_weighted_sample",
    "q90_subword_packing",
    "q127_user_sequences",
    "q65_hash_split",
    "q126_corpus_clean",
    "q58_dedup_fingerprint",
    "q117_length_batching",
    "q67_neardup_clusters",
    "q105_semantic_dedup",
    "q129_bm25_rank")

  for (name <- targets) {
    test(s"$name is invariant under 5 vs 32 shuffle partitions") {
      val a = rowsAt(name, 5).sortBy(_.mkString("|"))
      val b = rowsAt(name, 32).sortBy(_.mkString("|"))
      assert(a.size == b.size, s"row count differs: ${a.size} vs ${b.size}")
      a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
        assert(x == y, s"row $i differs:\n  $x\n  $y")
      }
    }
  }
}
