package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}

/** `Dataset.ofRows` is `private[sql]`: the established way for a library
  * to materialize a DataFrame from a hand-built `LogicalPlan` (here: the
  * custom [[graft.plans.TopKPerGroup]] node) is a one-method shim inside
  * the `org.apache.spark.sql` package — the same pattern Spark connector
  * libraries use. Nothing else in the engine lives outside `graft`.
  */
object GraftPlanShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** Column → Catalyst expression, EAGERLY converted (Spark 4 wraps
    * Columns in sql-api ColumnNodes; `ExpressionUtils.expression` only
    * wraps the node lazily in a non-serializable `ColumnNodeExpression`,
    * so the full converter must run to get a real catalyst tree).
    */
  def expressionOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Catalyst expression → Column (the inverse of [[expressionOf]]):
    * lets the library hand Spark's own non-registered expressions (e.g.
    * `BloomFilterMightContain`, the runtime-filter probe) back to the
    * DataFrame API.
    */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** `NormalizeFloatingNumbers.normalize` is `private[sql]`; graft's
    * custom group-scan operator needs it to canonicalize float/double
    * group keys (0.0 ≡ -0.0, one NaN bit pattern) exactly the way the
    * analyzer would for a built-in Window/Aggregate.
    */
  def normalizeFloatingNumbers(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)
}
