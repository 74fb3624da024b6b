package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingles(words, n)` — distinct word n-grams of an array<string>,
  * first-occurrence order, elements joined by a single space.
  *
  * Semantically identical to the declarative form
  *
  *   array_distinct(transform(sequence(0, size(w) - n),
  *     i -> concat_ws(' ', w[i], …, w[i+n-1])))
  *
  * but that HOF chain evaluates an interpreted lambda frame per shingle
  * (boxing + expression-tree walk each element; measured ~3 s of the
  * MinHash query's ~4.6 s at sf0.1 in the shingle transform alone).
  * This expression does the same work as one compiled loop per row and
  * stays inside whole-stage codegen via a static-helper call — the
  * generated code is a single method invocation, so the surrounding
  * stage keeps its fused pipeline.
  *
  * Differences from the HOF chain, both unreachable behind the
  * `size(w) >= n` guard callers apply: for size < n this returns an
  * empty array where `sequence(0, negative)` would count downward, and
  * null elements are skipped by concat-ws semantics either way.
  */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShinglesExpr.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.ShinglesExpr.compute($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesExpr {

  private val Sep = UTF8String.fromString(" ")

  /** One tight loop per row: build each n-gram with UTF8String.concatWs
    * (skips nulls like SQL concat_ws) and dedupe through a linked hash
    * set to keep first-occurrence order — exactly array_distinct's.
    */
  def compute(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) { parts(j) = words.getUTF8String(i + j); j += 1 }
      out.add(UTF8String.concatWs(Sep, parts: _*))
      i += 1
    }
    new GenericArrayData(out.toArray(Array.empty[AnyRef]))
  }
}
