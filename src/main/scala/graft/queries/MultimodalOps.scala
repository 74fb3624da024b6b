package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load
import graft.QueryDef

/** Oracle-checked queries over the multimodal operator surface
  * ([[graft.ops.Multimodal]]). The driver testdata has no binary table,
  * so the media frame is synthesized deterministically from `documents`:
  * payload = utf-8 bytes of `text` (pure-ASCII corpus, so DuckDB can
  * fold characters as bytes — same device as q26), kind assigned by
  * doc_id mod 3. The queries exercise the REAL operator path — typed
  * `mapPartitions` decode seam, per-partition codec init, binary never
  * re-emitted — not a reimplementation.
  *
  * Cross-engine determinism: `StubCodec.checksum` is a 31-multiplier
  * byte fold over Long with silent 2^64 wraparound. DuckDB BIGINT
  * overflow errors instead of wrapping, so the oracle folds in HUGEINT
  * with an explicit `% 2^64` per step and converts the final residue to
  * the signed two's-complement value — bit-exact JVM Long semantics.
  */
object MultimodalOps {

  /** The synthesized media catalog both engines agree on. */
  private def media(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      expr("element_at(array('image','audio','video'), CAST(doc_id % 3 AS INT) + 1)")
        .as("kind"),
      col("text").cast("binary").as("payload"))

  /** DuckDB rendering of StubCodec.checksum over `expr`'s characters:
    * HUGEINT fold with per-step 2^64 modulus, then signed conversion.
    */
  private def checksumSql(expr: String): String =
    s"""CAST(CASE WHEN fold >= 9223372036854775808 THEN fold - 18446744073709551616 ELSE fold END AS BIGINT)
       |FROM (SELECT LIST_REDUCE(
       |  LIST_PREPEND(CAST(1125899906842597 AS HUGEINT),
       |    LIST_TRANSFORM(STRING_SPLIT($expr, ''), ch -> CAST(ASCII(ch) AS HUGEINT))),
       |  (acc, c) -> (31 * acc + c) % 18446744073709551616) AS fold) f""".stripMargin

  // q59 — decode/featurize: the per-partition codec pipeline over opaque
  // payloads; output is the small fixed-width feature row (blob never
  // re-emitted). The float feature vector stays out of the oracle
  // projection (float32 fold isn't replayable in DuckDB); n_bytes and
  // the checksum pin the decode seam exactly.
  private def q59(s: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal.featurize(s, media(s, dir))
      .toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"), col("checksum"))
  private val q59Sql =
    s"""SELECT doc_id AS media_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  CAST(LENGTH(text) AS BIGINT) AS n_bytes,
      |  (SELECT ${checksumSql("text")}) AS checksum
      |FROM documents""".stripMargin

  // q60 — frame sampling: every 2nd 4-byte stripe of video payloads as a
  // "frame" row — bounded fan-out generate, one row per sampled frame.
  private def q60(s: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal.sampleFrames(s, media(s, dir), stride = 2)
      .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
        col("frame_checksum"))
  private val q60Sql =
    s"""SELECT media_id, f AS frame_no,
      |  (SELECT ${checksumSql("SUBSTRING(text, CAST(f * 4 + 1 AS INT), 4)")}) AS frame_checksum
      |FROM (
      |  SELECT doc_id AS media_id, text,
      |    UNNEST(GENERATE_SERIES(0, LENGTH(text) // 4 - 1)) AS f
      |  FROM documents WHERE doc_id % 3 = 2) t
      |WHERE f % 2 = 0""".stripMargin

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q59_multimodal_featurize", q59, Some(q59Sql)),
    QueryDef("q60_frame_sample", q60, Some(q60Sql)),
  )
}
