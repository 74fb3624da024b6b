package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `count_in(arr, 'a', 'b', …)` — number of elements of an array<string>
  * that belong to a constant set (occurrences, not distinct membership).
  *
  * Semantically identical to `size(filter(arr, x -> x IN ('a','b',…)))`,
  * but the HOF filter evaluates an interpreted lambda frame per element
  * (the dominant cost of the stopword/language-ID queries, which run it
  * five times per row over every token). The member set is fixed at
  * plan time, so it compiles to one hash set built once per operator and
  * a single compiled loop per row, inside whole-stage codegen.
  *
  * Null elements never match (same as the IN predicate under the HOF).
  */
case class CountInExpr(child: Expression, members: Seq[String])
    extends UnaryExpression {

  require(members.nonEmpty, "count_in needs at least one member")

  override def dataType: DataType = LongType
  override def prettyName: String = "count_in"

  @transient private lazy val set = CountInExpr.buildSet(members.toArray)

  override protected def nullSafeEval(input: Any): Any =
    CountInExpr.compute(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // materialize the member set once per generated operator instance
    val setRef = ctx.addReferenceObj("countInSet", set,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CountInExpr.compute($s, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInExpr =
    copy(child = newChild)
}

object CountInExpr {

  def buildSet(members: Array[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](members.length * 2)
    members.foreach(m => s.add(UTF8String.fromString(m)))
    s
  }

  def compute(arr: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    val m = arr.numElements()
    var n = 0L
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }
}
