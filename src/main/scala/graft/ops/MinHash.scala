package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash signatures + LSH band keys, shared between the batch catalog
  * (q17/q23/q146 use the same permutation family) and the streaming
  * ingest detector ([[graft.streaming.DocStreams.nearDupCandidates]]).
  *
  * [[withBands]] computes the 8 permutation minima PER ROW — the fused
  * [[graft.functions.MinHashSigsExpr]] instead of the batch
  * explode→groupBy(min) pipeline. Identical values (a min over the same
  * distinct set), but stateless and shuffle-free, which is what a
  * continuous query needs: signatures become a narrow map on the ingest
  * stream, and the only stateful operator downstream is the band-keyed
  * candidate store. The md5 runs ONCE per distinct shingle, inside the
  * same compiled loop as the eight permutation minima.
  *
  * Shape at 100 TB: per-row state is one shingle array (bounded by doc
  * length); no exchange at all until the band explode (×4 narrow rows).
  * The batch q17 keeps its explode+partial-agg form because its
  * downstream is already a shuffle; both forms are pinned equal in
  * MinHashSpec.
  */
object MinHash {

  /** Permutation family h_i(x) = (a_i·x + b_i) mod P, P = 2³¹−1.
    * Canonical constants live on [[graft.functions.MinHashSigsExpr]]
    * (the fused expression bakes them into generated code); these
    * aliases keep `queries.TextOps`' references working.
    */
  val P = graft.functions.MinHashSigsExpr.P
  val As: Seq[Long] = graft.functions.MinHashSigsExpr.As
  val Bs: Seq[Long] = graft.functions.MinHashSigsExpr.Bs

  /** Bands pair consecutive signatures: band_i = sig_{2i}·P + sig_{2i+1}. */
  val NumBands = 4

  /** (doc_id, sig0..sig7, band0..band3, n_shingles) for every document
    * with ≥ 3 words, computed per-row (no explode, no shuffle) via the
    * fused [[graft.functions.MinHashSigsExpr]] — shingling, hashing and
    * the 8 minima in one codegen'd loop instead of nine interpreted HOF
    * array passes (see that expression's scaladoc; value parity with
    * the batch explode→groupBy(min) form is pinned in MinHashSpec).
    *
    * The struct is materialized in its OWN Project before the fields
    * are extracted: CollapseProject refuses to merge a non-cheap
    * expression referenced 9 times, so the fused call runs once per
    * row by plan shape, not just by codegen subexpression elimination.
    */
  def withBands(d: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val mh = d
      .select(col(idCol), split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col(idCol),
        graft.functions.MinHashSigsExpr.column(col("w")).as("mh"))
    val withSigs = mh.select(
      col(idCol) +: col("mh.n_shingles").as("n_shingles") +:
        As.indices.map(i => col(s"mh.sig$i").as(s"sig$i")): _*)
    (0 until NumBands).foldLeft(withSigs) { (acc, b) =>
      acc.withColumn(s"band$b",
        col(s"sig${2 * b}") * P + col(s"sig${2 * b + 1}"))
    }
  }
}
