package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Typed, loss-free round-trips through the interchange formats a
  * pipeline meets beyond its native parquet: CSV (the export/import
  * lingua franca), ORC (the other columnar warehouse format), and
  * JSONL (the crawl/delivery format — read side lives in
  * [[graft.etl.Clean]], reference `Main.py:69-101`; this adds the
  * write side so the engine can produce what it consumes).
  *
  * Design rules, mirrored from the parquet sinks (SURVEY §2.1 S3):
  *
  *   - Writers never overwrite (`errorifexists`) — an idempotent
  *     re-run must fail loudly, not silently clobber a delivery.
  *   - CSV is schema-less on disk, so [[readCsv]] REQUIRES the schema
  *     (never `inferSchema` — a full extra pass at 100 TB, and type
  *     drift when a partition happens to hold only nulls). Reads are
  *     PERMISSIVE with the corrupt line captured in `_corrupt_record`,
  *     the same contract as the JSONL reader.
  *   - CSV quoting/escape/null markers are pinned explicitly rather
  *     than trusting defaults: `"` quotes with doubled-quote escape,
  *     empty-vs-null disambiguated by a dedicated null token, so
  *     strings containing commas, quotes, and newlines survive, and so
  *     do empty-but-not-null strings (the F1 filter semantics the
  *     reference depends on — `Main.py:148` keeps empty strings).
  *   - Timestamps serialize as ISO-8601 with microseconds; doubles
  *     round-trip via Java's shortest-round-trip rendering.
  *
  * Scale note: all three formats write one file per partition with no
  * coordination, same as parquet — layout (partitionBy, bucketing,
  * target file size via [[graft.ops.Compaction]]) composes unchanged.
  * ORC gets columns + predicate pushdown like parquet; CSV and JSONL
  * are row formats — scans read every byte, which is why they are
  * interchange formats here, never the storage format.
  */
object Formats {

  private val CsvNull = "\\N" // MySQL-style: distinct from the empty string

  private def csvCommon = Map(
    "header" -> "true",
    "quote" -> "\"",
    "escape" -> "\"", // RFC-4180 doubled quotes, not backslash
    "nullValue" -> CsvNull,
    "multiLine" -> "true", // quoted embedded newlines
    "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "dateFormat" -> "yyyy-MM-dd")
  // empty-vs-null on disk: null → \N (unquoted), empty string → ""
  // (quoted). The writer must emit the QUOTED form ("\"\"") and the
  // reader must map the unquoted empty token back to "" — asymmetric
  // options because the same logical value has a quoted written form
  // and an unquoted parsed form.
  private def csvWriteOptions = csvCommon + ("emptyValue" -> "\"\"")
  private def csvReadOptions = csvCommon + ("emptyValue" -> "")

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("errorifexists").options(csvWriteOptions).csv(path)

  /** Schema-required, corrupt-tolerant CSV read. The returned frame
    * carries `_corrupt_record` (null for clean rows) — callers filter
    * or quarantine, same contract as the JSONL reader.
    */
  def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read
      .options(csvReadOptions)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", "string"))
      .csv(path)

  /** Salvage-mode parquet read for a damaged lake directory: skips
    * files whose footer or pages fail to parse (`ignoreCorruptFiles` —
    * truncated uploads, partial writes) and files that vanish between
    * planning and execution (`ignoreMissingFiles` — a compactor or
    * retention job racing the reader; at 100 TB that race is a
    * certainty, not an edge case). Schema is REQUIRED, same rule as
    * [[readCsv]]: salvage must not depend on footer-based inference,
    * because the surviving-file subset (or an empty one) would silently
    * redefine the schema — the catalog's declared schema is the
    * contract. Default reads stay strict: data loss must be a stated
    * decision at the call site, never ambient configuration, which is
    * why this lives here as a separate verb instead of a session conf.
    */
  def readParquetSalvage(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read
      .option("ignoreCorruptFiles", "true")
      .option("ignoreMissingFiles", "true")
      .schema(schema)
      .parquet(path)

  /** ROW-GROUP-granularity salvage for MID-FILE damage — the level
    * below [[readParquetSalvage]]. Spark's corrupt-file tolerance
    * operates at SPLIT granularity: on a read error the scan skips the
    * rest of the current split only (rows already emitted from the
    * split survive; other splits are independent tasks). A default read
    * plans small-to-medium files as ONE split, so one torn page costs
    * the whole file. Planning the same salvage scan with splits sized
    * to the writer's row-group size (`splitBytes` ≈ the writer's
    * `parquet.block.size`) bounds the blast radius to the damaged row
    * group's own split: parquet assigns each row group to the split
    * containing its midpoint, and every task reads the (intact) footer
    * independently, so undamaged row groups keep their rows.
    *
    * The floor below THIS level is the footer: it is the file's
    * row-group index, so a corrupt footer still costs the whole file —
    * there is nothing addressable to salvage without it, and the
    * operational answer is re-fetch or quarantine
    * (SalvageReadSpec pins all three levels). Cost note: more splits =
    * more tasks and one footer read each; this is a recovery verb for
    * a damaged directory, not the steady-state scan.
    *
    * Split sizing is session configuration consulted at execution, so
    * the scan is planned in a config-isolated sibling session (same
    * SparkContext; the caller's session confs are untouched) — the
    * returned frame stays valid to the caller.
    */
  def readParquetSalvageRowGroups(s: SparkSession, path: String,
      schema: StructType, splitBytes: Long = 8L * 1024 * 1024): DataFrame = {
    val fine = s.newSession()
    // Carry the CALLER'S runtime SQL confs into the sibling: newSession()
    // re-derives session state from builder-time confs only, so a
    // runtime-adjusted session timezone or ANSI toggle would otherwise
    // silently not govern the salvage read. Static/immutable entries
    // reject the set with AnalysisException — they are shared with the
    // caller already, so ONLY that rejection is swallowed; any other
    // failure to copy a modifiable conf would leave the salvage scan
    // running under different semantics (the exact bug class this copy
    // exists to prevent) and must propagate.
    s.conf.getAll.foreach { case (k, v) =>
      try if (!fine.conf.getOption(k).contains(v)) fine.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
    fine.conf.set("spark.sql.files.maxPartitionBytes", splitBytes.toString)
    // openCostInBytes pads each file's size when packing splits; zero it
    // so the split grid actually lands on splitBytes boundaries
    fine.conf.set("spark.sql.files.openCostInBytes", "0")
    fine.read
      .option("ignoreCorruptFiles", "true")
      .option("ignoreMissingFiles", "true")
      .schema(schema)
      .parquet(path)
  }

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("errorifexists").orc(path)

  def readOrc(s: SparkSession, path: String): DataFrame =
    s.read.orc(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("errorifexists")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(path)

  /** Schema-required JSONL read with the Clean-stage corrupt contract. */
  def readJsonl(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .schema(schema.add("_corrupt_record", "string"))
      .json(path)
}
