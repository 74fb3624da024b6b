package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The damaged-lake recovery contract ([[Formats.readParquetSalvage]]):
  * corrupt files are skipped, vanished files are skipped, good rows
  * survive — and the DEFAULT read stays strict so data loss is always
  * an explicit call-site decision.
  */
class SalvageReadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString

  /** One part file of (id, v) rows appended to `dir`. */
  private def writeGood(dir: String, ids: Range): Unit =
    ids.map(i => (i.toLong, s"row$i")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(dir)

  private def schema = new org.apache.spark.sql.types.StructType()
    .add("id", "long").add("v", "string")

  test("salvage read skips a corrupt file and keeps every good row") {
    val dir = freshDir("salvage_corrupt")
    writeGood(dir, 0 until 100)
    writeGood(dir, 100 until 200)
    // a truncated upload: valid magic, garbage body, no footer
    Files.write(Paths.get(dir, "part-corrupt.parquet"),
      ("PAR1" + "x" * 512).getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)

    val salvaged = Formats.readParquetSalvage(spark, dir, schema)
    assert(salvaged.count() == 200)
    assert(salvaged.agg(sum(col("id"))).head().getLong(0) == (0L until 200L).sum)

    // the strict default must refuse the same directory
    val strict = spark.read.schema(schema).parquet(dir)
    intercept[Throwable] { strict.count() }
  }

  test("salvage read skips a file deleted between planning and execution") {
    val dir = freshDir("salvage_missing")
    writeGood(dir, 0 until 100)
    writeGood(dir, 100 until 200)

    val salvaged = Formats.readParquetSalvage(spark, dir, schema)
    val strict = spark.read.schema(schema).parquet(dir)
    // both frames have now LISTED the directory (planning); delete one
    // data file before execution — the compactor-vs-reader race
    val victim = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet")).sorted.head
    Files.delete(Paths.get(victim))

    val n = salvaged.count()
    assert(n == 100, s"expected the surviving file's 100 rows, got $n")
    intercept[Throwable] { strict.count() }
  }

  /** Footer metadata of the single parquet file in `dir`:
    * (filePath, per-row-group (startingPos, compressedBytes, rowCount)).
    */
  private def rowGroupLayout(dir: String): (String, Seq[(Long, Long, Long)]) = {
    import scala.jdk.CollectionConverters._
    val file = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).sorted.head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file),
      spark.sparkContext.hadoopConfiguration)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
        .map(b => (b.getStartingPos, b.getCompressedSize, b.getRowCount))
      (file, blocks)
    } finally reader.close()
  }

  test("row-group salvage recovers every intact row group of a mid-file corruption") {
    val dir = freshDir("salvage_rowgroup")
    // one file, many small row groups: ids are written in order, so row
    // group k holds a known contiguous id range (the footer's rowCount
    // prefix sums) — damage is attributable to exact ids
    val pad = "x" * 200
    (0 until 20000).map(i => (i.toLong, s"row$i$pad")).toDF("id", "v")
      .coalesce(1).sortWithinPartitions("id")
      .write.mode("overwrite").option("parquet.block.size", 64 * 1024).parquet(dir)
    val (file, blocks) = rowGroupLayout(dir)
    assert(blocks.length >= 4,
      s"need several row groups to attribute damage; got ${blocks.length}")

    // tear pages INSIDE a middle row group; footer and magic stay valid
    val victim = blocks.length / 2
    val (vStart, vLen, _) = blocks(victim)
    val ch = java.nio.channels.FileChannel.open(Paths.get(file),
      StandardOpenOption.WRITE)
    try {
      ch.position(vStart + math.min(8L, vLen / 2))
      ch.write(java.nio.ByteBuffer.wrap(Array.fill[Byte](
        math.min(256L, vLen / 2).toInt)(0x5A)))
    } finally ch.close()

    // level 0 — strict: refuses the directory (materialize columns —
    // a bare count() reads only footers and never touches the torn page)
    intercept[Throwable] {
      spark.read.schema(schema).parquet(dir).select("id").collect()
    }
    // level 1 — file-granularity salvage: one split holds the whole
    // file, so the error poisons everything after it in that split;
    // only rows emitted BEFORE the torn page survive. This is the
    // documented file-level floor.
    val fileLevel = Formats.readParquetSalvage(spark, dir, schema)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(fileLevel.size < 20000)
    // level 2 — row-group-granularity: split the scan at the writer's
    // block size; expected loss = the victim's split suffix only
    val splitBytes = 64L * 1024
    def splitOf(b: (Long, Long, Long)): Long = (b._1 + b._2 / 2) / splitBytes
    val idStart = blocks.scanLeft(0L)(_ + _._3)
    val lost = blocks.zipWithIndex.filter { case (b, k) =>
      splitOf(b) == splitOf(blocks(victim)) && k >= victim
    }.map(_._2).toSet
    val expected = blocks.indices.filterNot(lost)
      .flatMap(k => idStart(k) until idStart(k + 1)).toSet
    val fine = Formats.readParquetSalvageRowGroups(spark, dir, schema, splitBytes)
      .select("id").collect().map(_.getLong(0)).toSet
    // every id outside the victim's split suffix is recovered, and
    // nothing past the tear inside it leaks through half-read
    assert(expected.subsetOf(fine),
      s"row-group salvage lost intact rows: missing ${(expected -- fine).take(5)}")
    val vicIds = (idStart(victim) until idStart(victim + 1)).toSet
    assert(fine.size > fileLevel.size, "finer splits must recover more than file level")
    assert((fine -- expected).subsetOf(vicIds),
      "recovered ids beyond the intact set must come from the victim row group's own prefix")
    // and the same fine-split read on an UNDAMAGED twin is lossless
    val dir2 = freshDir("salvage_rowgroup_clean")
    (0 until 20000).map(i => (i.toLong, s"row$i$pad")).toDF("id", "v")
      .coalesce(1).sortWithinPartitions("id")
      .write.mode("overwrite").option("parquet.block.size", 64 * 1024).parquet(dir2)
    assert(Formats.readParquetSalvageRowGroups(spark, dir2, schema, splitBytes)
      .count() == 20000L)
  }

  test("a corrupt footer is the salvage floor: the whole file is lost at every level") {
    val dir = freshDir("salvage_footer")
    writeGood(dir, 0 until 100)
    writeGood(dir, 100 until 200)
    val (file, _) = rowGroupLayout(dir) // sorted.head = first part file
    // tear the footer length+magic at EOF: the row-group index is gone
    val size = Files.size(Paths.get(file))
    val ch = java.nio.channels.FileChannel.open(Paths.get(file),
      StandardOpenOption.WRITE)
    try {
      ch.position(size - 12)
      ch.write(java.nio.ByteBuffer.wrap(Array.fill[Byte](12)(0x5A)))
    } finally ch.close()
    // nothing is addressable without the footer — both salvage levels
    // skip the file entirely; the other file's rows all survive
    assert(Formats.readParquetSalvage(spark, dir, schema).count() == 100L)
    assert(Formats.readParquetSalvageRowGroups(spark, dir, schema, 64L * 1024)
      .count() == 100L)
    intercept[Throwable] { spark.read.schema(schema).parquet(dir).count() }
  }

  test("row-group salvage runs under the caller's RUNTIME session confs") {
    // newSession() re-derives state from builder-time confs only — a
    // runtime-adjusted timezone or ANSI toggle must still govern the
    // salvage read (ADVICE r09), so the sibling session copies the
    // caller's runtime confs before applying its split-size overrides.
    val dir = freshDir("salvage_conf")
    writeGood(dir, 0 until 10)
    val tzKey = "spark.sql.session.timeZone"
    val ansiKey = "spark.sql.ansi.enabled"
    val (tz0, ansi0) = (spark.conf.get(tzKey), spark.conf.get(ansiKey))
    try {
      spark.conf.set(tzKey, "Pacific/Chatham") // nobody's builder default
      spark.conf.set(ansiKey, (ansi0.toBoolean.unary_!).toString)
      val df = Formats.readParquetSalvageRowGroups(spark, dir, schema)
      val c = df.sparkSession.conf
      assert(c.get(tzKey) == "Pacific/Chatham")
      assert(c.get(ansiKey) != ansi0)
      // and the split overrides still won over the copied confs
      assert(c.get("spark.sql.files.openCostInBytes") == "0")
      assert(df.count() == 10L)
    } finally {
      spark.conf.set(tzKey, tz0)
      spark.conf.set(ansiKey, ansi0)
    }
  }
}
