package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, GraftPlanShim}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join pruning: build a compact membership filter
  * over one side's join keys, probe it map-side on the other side
  * BEFORE the exact join.
  *
  * This is the middle regime between graft's two existing join shapes:
  *  - small build side  → broadcast hash join (exact, q71);
  *  - bloom regime      → build side too big for an executor hash
  *    table, but its KEYS fit a bit array (~1.2 MB per 10⁶ keys at 1%
  *    fpp, independent of key width) → prune, then exact join;
  *  - huge both sides   → plain shuffle join.
  *
  * The filter admits no false negatives, so `prune → exact join`
  * returns byte-identical results to the unpruned join — false
  * positives only cost a few extra rows entering the join. Spark
  * applies the same idea automatically between shuffle stages
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, injected as
  * `BloomFilterAggregate`/`BloomFilterMightContain` around a join);
  * this operator is the explicit form for when the build side is a
  * DIFFERENT computation than the probe's join partner (e.g. a
  * decontamination list derived upstream) or the filter should be
  * built once and reused across many queries.
  *
  * Mechanics: keys are hashed to i64 with `xxhash64` (seed 42 — the
  * same hash Spark's injected runtime filters use), the bit array is
  * built DISTRIBUTED (`stat.bloomFilter` runs a treeAggregate; only
  * the merged bits reach the driver), and the probe is Spark's own
  * native `BloomFilterMightContain` expression — whole-stage-codegen
  * friendly, deserialized once per task, no UDF in the hot path.
  *
  * At 100 TB: the serialized filter rides in the plan as a binary
  * literal (the same transport Spark uses for its runtime-filter
  * subquery results), so executors pay one deserialize per task; size
  * the filter from table-stats NDV, not row count.
  */
object BloomPrune {

  /** A built filter; `mightContain` yields the native probe predicate. */
  final class Filter private[BloomPrune] (bytes: Array[Byte]) extends Serializable {
    /** Serialized size — what actually ships to executors. */
    def sizeBytes: Int = bytes.length

    /** Native codegen probe: true if `key` MIGHT be in the build set
      * (no false negatives; `fpp` false positives).
      */
    def mightContain(key: Column): Column =
      GraftPlanShim.columnOf(BloomFilterMightContain(
        Literal(bytes, BinaryType),
        GraftPlanShim.expressionOf(xxhash64(key))))
  }

  /** Build a filter over `key` of `build` (distributed treeAggregate;
    * driver holds only the merged bit array). `expectedItems` sizes the
    * bit array — at scale, take it from catalog NDV statistics.
    */
  def build(df: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01): Filter = {
    val bf = df.select(xxhash64(key).as("__bloom_key"))
      .stat.bloomFilter("__bloom_key", expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    new Filter(bos.toByteArray)
  }
}
