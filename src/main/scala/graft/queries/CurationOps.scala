package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.load
import graft.QueryDef

/** Corpus-curation operators the dedup/quality families don't cover:
  * PII scrubbing, blocked fuzzy entity resolution, inverted-index
  * construction, deterministic weighted sampling, and length-bucketed
  * batch construction. Reference scope: the reference ETL
  * (`/root/reference/Main.py:140-176`) cleans and filters articles but
  * has no privacy, linkage, or training-batch stage — these are the
  * standard extensions a production training-data pipeline adds on top.
  *
  * Cross-engine determinism follows the TextOps conventions: hashes are
  * md5-derived 60-bit integers, scores are exact-integer arithmetic, and
  * every regex below sticks to the syntax subset (classes, bounded
  * repetition, non-capturing groups, `\b`) where Java regex (Spark) and
  * RE2 (DuckDB) agree on leftmost-greedy semantics — no alternation
  * whose leftmost-first vs leftmost-longest resolution could differ.
  */
object CurationOps {

  /** 60-bit portable hash (same contract as TextOps.h60). */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
  private def h60Sql(e: String): String =
    s"CAST('0x' || SUBSTRING(MD5($e), 1, 15) AS BIGINT)"

  /** Single-file documents parquet → spread across the session's
    * parallelism before per-row regex/hash work (see TextOps.docs). */
  private def docs(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .repartition(s.sessionState.conf.numShufflePartitions)

  // ---------------------------------------------------------------------
  // q113 — PII detection + redaction. The corpus is synthetic word salad,
  // so the query first plants deterministic PII (an email, a phone, an
  // IPv4 derived from doc_id) and then detects/redacts it — proving the
  // scrub finds what is provably there, the same shape as seeding a
  // canary into a privacy filter. Patterns are the portable-regex subset
  // (see object scaladoc). Redaction order (email → ip → phone) is fixed
  // so both engines transform identically; output carries md5(redacted)
  // rather than the redacted text to keep the compared surface small.
  // Shape at 100 TB: fully narrow — per-row regex work, no shuffle; the
  // regexes compile once per codegen'd task, not per row.
  // ---------------------------------------------------------------------
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  private val ipRe = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  private def q113(s: SparkSession, dir: String): DataFrame = {
    val dirty = docs(s, dir).select(
      col("doc_id"),
      concat(
        col("text"),
        lit(" Contact user"), col("doc_id").cast("string"),
        lit("@example.com or 555-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" from 10."), (col("doc_id") % 200).cast("string"),
        lit(".0."), (col("doc_id") % 250).cast("string")).as("t"))
    dirty.select(
      col("doc_id"),
      regexp_count(col("t"), lit(emailRe)).cast("long").as("n_emails"),
      regexp_count(col("t"), lit(phoneRe)).cast("long").as("n_phones"),
      regexp_count(col("t"), lit(ipRe)).cast("long").as("n_ips"),
      md5(regexp_replace(
        regexp_replace(
          regexp_replace(col("t"), emailRe, "<EMAIL>"),
          ipRe, "<IP>"),
        phoneRe, "<PHONE>")).as("red_md5"))
  }
  private val q113Sql =
    """WITH dirty AS (
      |  SELECT doc_id,
      |    text || ' Contact user' || CAST(doc_id AS VARCHAR)
      |      || '@example.com or 555-'
      |      || LPAD(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
      |      || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |      || ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
      |      || '.0.' || CAST(doc_id % 250 AS VARCHAR) AS t
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(LEN(REGEXP_EXTRACT_ALL(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(LEN(REGEXP_EXTRACT_ALL(t, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
      |  CAST(LEN(REGEXP_EXTRACT_ALL(t, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ips,
      |  MD5(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(t,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
      |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g')) AS red_md5
      |FROM dirty""".stripMargin

  // ---------------------------------------------------------------------
  // q114 — blocked fuzzy entity resolution (record linkage). A "dirty"
  // feed is derived from customer names by deleting the vowels u/o
  // (edit distance 2 from the clean form), then linked back: candidate
  // generation by BLOCKING KEY (last 3 characters — digits survive the
  // perturbation), scoring by Levenshtein, best match = min (distance,
  // custkey) per dirty record via the native TopKPerGroup operator.
  // Shape at 100 TB: the block key turns an O(n²) all-pairs string
  // comparison into an equi-join whose per-key fan-out is the block
  // size — the same candidate-bounding role the LSH bands play for
  // near-dup (q17). Skewed blocks get the q88 salted-join treatment;
  // Levenshtein runs only on candidates, never all pairs.
  // ---------------------------------------------------------------------
  private def q114(s: SparkSession, dir: String): DataFrame = {
    val clean = load(s, dir, "customer").select(col("c_custkey"), col("c_name"))
    val dirty = clean.select(
      col("c_custkey").as("dirty_key"),
      regexp_replace(col("c_name"), "[uo]", "").as("dirty_name"))
    val cand = dirty
      .withColumn("blk", expr("right(dirty_name, 3)"))
      .join(clean.withColumn("blk", expr("right(c_name, 3)")), Seq("blk"))
      .withColumn("dist", levenshtein(col("dirty_name"), col("c_name")).cast("long"))
      .filter(col("dist") <= 2)
    graft.ops.TopK.perGroup(
        cand, Seq("dirty_key"), Seq(col("dist"), col("c_custkey")), k = 1)
      .select(col("dirty_key"), col("c_custkey").as("match_key"), col("dist"))
  }
  private val q114Sql =
    """WITH dirty AS (
      |  SELECT c_custkey AS dirty_key,
      |         REGEXP_REPLACE(c_name, '[uo]', '', 'g') AS dirty_name
      |  FROM customer),
      |cand AS (
      |  SELECT d.dirty_key, c.c_custkey AS match_key,
      |         CAST(LEVENSHTEIN(d.dirty_name, c.c_name) AS BIGINT) AS dist
      |  FROM dirty d JOIN customer c ON RIGHT(d.dirty_name, 3) = RIGHT(c.c_name, 3)
      |  WHERE LEVENSHTEIN(d.dirty_name, c.c_name) <= 2),
      |r AS (SELECT *, ROW_NUMBER() OVER (
      |        PARTITION BY dirty_key ORDER BY dist, match_key) AS rn FROM cand)
      |SELECT dirty_key, match_key, dist FROM r WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------------
  // q115 — inverted index (term → document-frequency + capped posting
  // list). Postings are capped at the 10 smallest doc_ids (a champion
  // list); only terms with df >= 20 are emitted. One shuffle computes
  // df and the per-term rank in the same window sort; the final group
  // re-uses the hash partitioning.
  // Shape at 100 TB: the cap is the load-bearing decision — an UNCAPPED
  // collect_list materializes a stopword's entire posting list (10^8
  // ids) on one reducer; capping at k keeps per-key state O(k)
  // regardless of term skew (same argument as BoundedCollectAggregator
  // in q57). df itself stays a partial-aggregatable count.
  // ---------------------------------------------------------------------
  private def q115(s: SparkSession, dir: String): DataFrame = {
    val t = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .distinct()
    val w = Window.partitionBy(col("term"))
    t.withColumn("df", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(w.orderBy(col("doc_id"))))
      .filter(col("df") >= 20 && col("rn") <= 10)
      .groupBy(col("term"), col("df"))
      .agg(expr(
        "array_join(transform(sort_array(collect_list(doc_id)), x -> CAST(x AS STRING)), ',')")
        .as("postings"))
      .select(col("term"), col("df"), col("postings"))
  }
  private val q115Sql =
    """WITH raw AS (
      |  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents),
      |t AS (SELECT DISTINCT doc_id, term FROM raw),
      |g AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
      |             LIST(doc_id ORDER BY doc_id) AS l
      |      FROM t GROUP BY term)
      |SELECT term, df, ARRAY_TO_STRING(l[1:10], ',') AS postings
      |FROM g WHERE df >= 20""".stripMargin

  // ---------------------------------------------------------------------
  // q116 — deterministic weighted sampling without replacement
  // (integerized priority sampling / A-ES): each doc draws a portable
  // uniform u = h60(doc_id) and gets priority key u div weight — a
  // monotone integer proxy for the u^(1/w) exponential-keys scheme
  // (higher weight → smaller key in expectation); the sample is the
  // global 200 smallest (key, doc_id). Exact integers end-to-end, so
  // both engines select the identical sample — the float pow()/ln()
  // forms would be 1-ulp-fragile at the selection boundary (the q107
  // lesson). Weight = n_chars (longer docs oversampled ∝ length, the
  // standard token-budget weighting).
  // Shape at 100 TB: global top-k compiles to TakeOrderedAndProject —
  // per-partition heaps of 200, no global sort, no full shuffle.
  // ---------------------------------------------------------------------
  private def q116(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(col("n_chars") > 0)
      .withColumn("u", h60(col("doc_id").cast("string")))
      .select(
        col("doc_id"), col("n_chars").as("weight"),
        expr("u div n_chars").as("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(200)
  private val q116Sql =
    s"""WITH k AS (
      |  SELECT doc_id, n_chars AS weight,
      |         ${h60Sql("CAST(doc_id AS VARCHAR)")} // n_chars AS priority
      |  FROM documents WHERE n_chars > 0)
      |SELECT doc_id, weight, priority FROM k
      |ORDER BY priority, doc_id LIMIT 200""".stripMargin

  // ---------------------------------------------------------------------
  // q117 — length-bucketed batch construction (dynamic batching): docs
  // are binned by estimated token length (64-token-wide buckets), each
  // bucket is split into batches of 32 docs in doc_id order, and each
  // batch reports its padding waste = n_docs·max_tokens − Σtokens — the
  // cost a dataloader pays to pad a batch to its longest member, and
  // the number length-grouping exists to minimize. All integers.
  // Shape at 100 TB: one shuffle, partitioned by bucket; bucket
  // cardinality is bounded (max_len/64) so a hot bucket is the skew
  // case — there you'd sub-shard by doc_id range (ops/GlobalIndex gives
  // contiguous positions per shard) instead of one window per bucket.
  // ---------------------------------------------------------------------
  private def q117(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(
      col("doc_id"),
      expr("n_chars div 4").as("est_tokens"),
      expr("(n_chars div 4) div 64").as("bucket"))
    base
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("bucket")).orderBy(col("doc_id"))))
      .withColumn("batch_id", expr("(rn - 1) div 32"))
      .groupBy(col("bucket"), col("batch_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        max(col("est_tokens")).as("max_tok"),
        sum(col("est_tokens")).as("tok_sum"))
      .select(
        col("bucket"), col("batch_id"), col("n_docs"), col("max_tok"),
        col("tok_sum"),
        (col("n_docs") * col("max_tok") - col("tok_sum")).as("waste"))
  }
  private val q117Sql =
    """WITH base AS (
      |  SELECT doc_id, n_chars // 4 AS est_tokens,
      |         (n_chars // 4) // 64 AS bucket
      |  FROM documents),
      |rn AS (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY bucket ORDER BY doc_id) AS rn FROM base),
      |b AS (
      |  SELECT bucket, (rn - 1) // 32 AS batch_id,
      |         CAST(COUNT(*) AS BIGINT) AS n_docs,
      |         MAX(est_tokens) AS max_tok,
      |         CAST(SUM(est_tokens) AS BIGINT) AS tok_sum
      |  FROM rn GROUP BY bucket, (rn - 1) // 32)
      |SELECT bucket, batch_id, n_docs, max_tok, tok_sum,
      |       CAST(n_docs * max_tok - tok_sum AS BIGINT) AS waste
      |FROM b""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q113_pii_redaction", q113, Some(q113Sql)),
    QueryDef("q114_fuzzy_match", q114, Some(q114Sql)),
    QueryDef("q115_inverted_index", q115, Some(q115Sql)),
    QueryDef("q116_weighted_sample", q116, Some(q116Sql)),
    QueryDef("q117_length_batching", q117, Some(q117Sql)),
  )
}
