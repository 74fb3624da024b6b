package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused forms of `aggregate(zip_with(a, b, λ), 0.0, (acc,x) -> acc+x)`
  * over array<double> — the targets of [[graft.plans.FuseZipFold]].
  *
  * Exact-semantics replacements, unlike [[DotProductExpr]] (which takes
  * the min length and assumes non-null elements — fine where callers
  * guarantee fixed-width vectors, wrong as a blind rewrite): zip_with
  * pads the shorter array with nulls, the λ then yields a null element,
  * and the fold's `acc + null` collapses the whole sum to null. So these
  * return null on ANY length mismatch or null element — bit-identical
  * to the HOF chain on every input, which is what licenses the optimizer
  * rewrite. Addition order is the same strict left fold.
  */
abstract class ZipFoldBase extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Java expression for one element's contribution, over doubles x/y. */
  protected def elementJava(x: String, y: String): String

  protected def elementEval(x: Double, y: Double): Double

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (ys.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      acc += elementEval(xs.getDouble(i), ys.getDouble(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = $a.getDouble($i);
         |    double $y = $b.getDouble($i);
         |    $acc += ${elementJava(x, y)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ with exact zip_with/aggregate null semantics. */
case class ZipFoldProduct(left: Expression, right: Expression)
    extends ZipFoldBase {
  override def prettyName: String = "zip_fold_product"
  override protected def elementJava(x: String, y: String): String = s"$x * $y"
  override protected def elementEval(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZipFoldProduct =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ-bᵢ)² — squared euclidean distance, same null semantics. */
case class ZipFoldSqDiff(left: Expression, right: Expression)
    extends ZipFoldBase {
  override def prettyName: String = "zip_fold_sqdiff"
  override protected def elementJava(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def elementEval(x: Double, y: Double): Double =
    (x - y) * (x - y)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZipFoldSqDiff =
    copy(left = newLeft, right = newRight)
}
