package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing an element-wise mean of float vectors —
  * the per-label centroid used by embedding pipelines (and the one
  * custom-UDAF surface the engine demonstrates, SURVEY.md §7.4).
  *
  * Buffer is (running sums, count); merge is element-wise — partial
  * aggregation (map-side combine) falls out of the Aggregator contract,
  * so at 100 TB each executor reduces its partitions locally and only
  * dim-width buffers cross the wire, never row vectors.
  *
  * Note on determinism: double addition is order-dependent, so distinct
  * partitionings can differ in final ulps. That is fine for the library
  * API; the oracle-checked centroid query (q21) uses integer micro-units
  * instead. Callers needing run-to-run bit equality should round.
  */
class VectorMeanAggregator(dim: Int)
    extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    if (v != null) {
      val (sums, _) = b
      val n = math.min(dim, v.length)
      var i = 0
      while (i < n) { sums(i) += v(i); i += 1 }
      (sums, b._2 + 1)
    } else b
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    val (sa, _) = a
    val (sb, _) = b
    var i = 0
    while (i < dim) { sa(i) += sb(i); i += 1 }
    (sa, a._2 + b._2)
  }

  override def finish(r: (Array[Double], Long)): Array[Double] = {
    val (sums, n) = r
    if (n == 0) sums
    else {
      val out = new Array[Double](dim)
      var i = 0
      while (i < dim) { out(i) = sums(i) / n; i += 1 }
      out
    }
  }

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
