package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")
    .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"),
      xxhash64(col("text")).as("h"))

  test("every doc lands in exactly one pack; streaming-packing invariant holds") {
    val packed = Packing.packGreedy(docs, col("doc_id"), col("n_tok"),
        col("h"), budget = 500L, nShards = 8)
      .collect()
    val n = docs.count()
    assert(packed.length == n)
    assert(packed.map(_.getLong(0)).distinct.length == n)
    // exact check: replay the greedy packing per shard in plain Scala —
    // a doc's pack is where its START offset lands in (hash, id) order
    val byShard = packed.groupBy(_.getLong(1))
    val ref = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"),
        xxhash64(col("text")).as("h"))
      .withColumn("shard", pmod(col("h"), lit(8L)))
      .collect().groupBy(_.getLong(3))
    byShard.foreach { case (shard, rows) =>
      val expect = ref(shard).sortBy(r => (r.getLong(2), r.getLong(0)))
        .foldLeft((0L, Map.empty[Long, Long])) { case ((cum, acc), r) =>
          (cum + r.getLong(1), acc + (r.getLong(0) -> cum / 500L))
        }._2
      rows.foreach { r =>
        assert(r.getLong(3) == expect(r.getLong(0)),
          s"doc ${r.getLong(0)} in shard $shard: pack ${r.getLong(3)} != ${expect(r.getLong(0))}")
      }
    }
  }

  test("nShards knob controls cumsum parallelism") {
    def shards(n: Int): Long =
      Packing.packGreedy(docs, col("doc_id"), col("n_tok"), col("h"),
        budget = 500L, nShards = n)
        .select(col("shard")).distinct().count()
    assert(shards(4) == 4L)
    assert(shards(32) > 24L) // 500 docs over 32 hash buckets: all-but-few hit
  }

  test("default nShards scales with the session's shuffle parallelism") {
    val p = Packing.packGreedy(docs, col("doc_id"), col("n_tok"), col("h"),
      budget = 500L)
    val maxShard = p.agg(max(col("shard"))).head.getLong(0)
    val expected = 4L * spark.sessionState.conf.numShufflePartitions
    assert(maxShard < expected)
    assert(maxShard >= expected / 2, // 500 docs: upper half surely hit
      s"default shard range looks wrong: max=$maxShard expected<$expected")
  }
}
