package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash signatures + LSH band keys, shared between the batch catalog
  * (q17/q23/q146 use the same permutation family) and the streaming
  * ingest detector ([[graft.streaming.DocStreams.nearDupCandidates]]).
  *
  * [[withBands]] computes the 8 permutation minima PER ROW over the
  * distinct-shingle array — `array_min(transform(hs, …))` instead of the
  * batch explode→groupBy(min) pipeline. Identical values (a min over the
  * same distinct set), but stateless and shuffle-free, which is what a
  * continuous query needs: signatures become a narrow map on the ingest
  * stream, and the only stateful operator downstream is the band-keyed
  * candidate store. The md5 (`h60`) runs ONCE per shingle into `hs`; the
  * eight permutations are arithmetic-only HOF passes over that.
  *
  * Shape at 100 TB: per-row state is one shingle array (bounded by doc
  * length); no exchange at all until the band explode (×4 narrow rows).
  * The batch q17 keeps its explode+partial-agg form because its
  * downstream is already a shuffle; both forms are pinned equal in
  * MinHashSpec.
  */
object MinHash {

  /** Permutation family h_i(x) = (a_i·x + b_i) mod P, P = 2³¹−1.
    * Single source of truth — `queries.TextOps` aliases these.
    */
  val P = 2147483647L
  val As = Seq(7L, 13L, 31L, 61L, 127L, 251L, 509L, 1021L)
  val Bs = Seq(3L, 17L, 29L, 47L, 89L, 101L, 131L, 149L)

  /** Bands pair consecutive signatures: band_i = sig_{2i}·P + sig_{2i+1}. */
  val NumBands = 4

  private def h60(c: Column): Column =
    graft.functions.H60Expr.column(c)

  /** (doc_id, sig0..sig7, band0..band3, n_shingles) for every document
    * with ≥ 3 words, computed per-row (no explode, no shuffle).
    * Requires the `shingles` native expression — callers must have run
    * [[graft.functions.VectorExpressions.register]] on the session.
    */
  def withBands(d: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sh = d
      .select(col(idCol), split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col(idCol), expr("shingles(w, 3)").as("sh"))
    val hs = sh.select(col(idCol), size(col("sh")).cast("long").as("n_shingles"),
      transform(col("sh"), x => h60(x) % P).as("hs"))
    val sigs = As.indices.map { i =>
      array_min(transform(col("hs"),
        h => (h * As(i) + Bs(i)) % P)).as(s"sig$i")
    }
    val withSigs = hs.select(col(idCol) +: col("n_shingles") +: sigs: _*)
    (0 until NumBands).foldLeft(withSigs) { (acc, b) =>
      acc.withColumn(s"band$b",
        col(s"sig${2 * b}") * P + col(s"sig${2 * b + 1}"))
    }
  }
}
