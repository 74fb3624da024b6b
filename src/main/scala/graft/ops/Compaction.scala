package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-files compaction: bin-pack a parquet directory into files of
  * roughly `targetBytes` each. The small-files problem is a first-order
  * failure mode at 100 TB — streaming sinks, per-batch enrichment
  * writes, and fine-grained partitioning all emit files far below the
  * HDFS-block/row-group sweet spot, and every downstream scan then pays
  * per-file open/footer/seek costs plus a task per file (a 1 M-file
  * table schedules 1 M tasks before reading a byte).
  *
  * Two modes, because the right plan depends on why the files are small:
  *  - `shuffle = false` (default): `coalesce` — merges input partitions
  *    in place with NO shuffle. Cheapest possible fix; file sizes stay
  *    only as even as the inputs' distribution (k small files → one
  *    bigger file each, no splitting). The right call for "a stream
  *    wrote 10k tiny files of similar size".
  *  - `shuffle = true`: round-robin `repartition` — one full shuffle
  *    buying evenly-sized output files regardless of input skew. The
  *    right call when input sizes are wildly uneven (or when output
  *    must also drop an accidental clustering).
  *
  * Sizing uses the REAL on-disk byte count from the filesystem, not row
  * counts — parquet compression ratios vary too much across columns for
  * row-based sizing to hold. Output-file count = ceil(bytes / target),
  * so the operator is idempotent: compacting an already-compact
  * directory is a no-op-shaped single-pass rewrite.
  */
object Compaction {

  final case class Stats(
      filesBefore: Int, bytesBefore: Long, filesAfter: Int, bytesAfter: Long)

  /** Compact `inDir` (parquet) into `outDir` with ~`targetBytes` files.
    * Returns before/after file statistics. `outDir` must not exist
    * (no-overwrite contract, same as the reference's sinks).
    *
    * Hive-partitioned inputs are sized correctly (recursive listing),
    * but the rewrite is FLAT — partition columns become data columns.
    * To keep a partitioned layout, run compact() per partition
    * directory (the normal maintenance-job shape: compact exactly the
    * partitions whose file counts drifted).
    */
  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long = 128L * 1024 * 1024,
      shuffle: Boolean = false): Stats = {
    require(targetBytes > 0, "targetBytes must be positive")
    val (nIn, bytesIn) = dirStats(spark, inDir)
    val nOut = math.max(1L, (bytesIn + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inDir)
    val packed = if (shuffle) df.repartition(nOut) else df.coalesce(nOut)
    packed.write.mode("errorifexists").parquet(outDir)
    val (nAfter, bytesAfter) = dirStats(spark, outDir)
    Stats(nIn, bytesIn, nAfter, bytesAfter)
  }

  /** (parquet file count, total bytes) for a directory, via the Hadoop
    * FileSystem API — works for any FS the session can reach (local,
    * HDFS, object stores). RECURSIVE: Hive-partitioned layouts nest the
    * data files under key=value subdirectories, and a non-recursive
    * listing would report 0 files / 0 bytes and silently missize the
    * compaction.
    */
  def dirStats(spark: SparkSession, dir: String): (Int, Long) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, /* recursive = */ true)
    var n = 0
    var bytes = 0L
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && name.endsWith(".parquet") &&
          !name.startsWith("_") && !name.startsWith(".")) {
        n += 1
        bytes += st.getLen
      }
    }
    (n, bytes)
  }
}
