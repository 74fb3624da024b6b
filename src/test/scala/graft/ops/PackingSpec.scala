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

  test("manifest offsets are consistent with pack assignment and budget") {
    val m = Packing.packManifest(docs, col("doc_id"), col("n_tok"),
        col("h"), budget = 500L, nShards = 8).collect()
    val g = Packing.packGreedy(docs, col("doc_id"), col("n_tok"),
        col("h"), budget = 500L, nShards = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    m.foreach { r =>
      val (doc, shard, n, pack, off) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(g(doc) == (shard, pack)) // manifest never disagrees with packGreedy
      assert(off >= 0 && off < 500L) // start offset lies inside the pack
      assert(n > 0)
    }
    // within a pack, docs tile contiguously: each starts where the
    // previous ended (the head slot may be occupied by the previous
    // pack's overflowing tail, so the first offset need not be 0); every
    // doc except the pack's last ends inside the budget
    m.groupBy(r => (r.getLong(1), r.getLong(3))).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(4)).map(r => (r.getLong(4), r.getLong(2))).toSeq
      sorted.zip(sorted.drop(1)).foreach { case ((off1, n1), (off2, _)) =>
        assert(off1 + n1 < 500L && off2 == off1 + n1)
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
