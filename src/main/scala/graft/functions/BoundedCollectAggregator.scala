package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Typed `Aggregator`: collect up to `cap` longs per group, or null if
  * the group exceeds the cap — a partial-aggregation-safe bounded
  * collect_list.
  *
  * This is the 100 TB answer to document-frequency capping (q57): a
  * plain `collect_list ... HAVING count <= cap` materializes a viral
  * key's ENTIRE id list on one reducer before the filter can drop it
  * (one shingle in 10M docs = one 80 MB row). Here the buffer invariant
  * is `buffer.length == min(group_size, cap+1)`: reduce stops appending
  * at cap+1, merge concatenates then truncates to cap+1, so no state —
  * map-side or reduce-side — ever exceeds cap+1 ids regardless of key
  * skew. `finish` maps length > cap to null (caller filters), else
  * returns the exact, complete id set: truncation only ever happens to
  * groups that are dropped anyway, so kept groups are exact.
  */
class BoundedCollectAggregator(cap: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  private val lim = cap + 1

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], v: Long): Array[Long] =
    if (b.length >= lim) b else b :+ v

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.length >= lim) a
    else if (b.length >= lim) b
    else {
      val m = a ++ b
      if (m.length > lim) java.util.Arrays.copyOf(m, lim) else m
    }

  override def finish(r: Array[Long]): Array[Long] =
    if (r.length > cap) null else r

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
