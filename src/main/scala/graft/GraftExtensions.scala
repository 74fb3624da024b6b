package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CountInExpr, DotProductExpr, RollingHashExpr, ShinglesExpr, SubwordCountExpr, SubwordTokenizeExpr, SubwordVocab, VecNormExpr, VectorExpressions}

/** Session-extension packaging for the engine's native functions — the
  * idiomatic way to ship custom Catalyst expressions with a library:
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ...
  *
  * (or `.withExtensions(new GraftExtensions)`). Injected functions are
  * catalog-visible in every session of the application, unlike the
  * per-session imperative registration in
  * [[graft.functions.VectorExpressions.register]] (kept for REPL/test
  * convenience).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      exprs => DotProductExpr(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VecNormExpr].getName, "vec_norm"),
      exprs => VecNormExpr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHashExpr].getName, "rolling_hash"),
      exprs => RollingHashExpr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "shingles"),
      exprs => ShinglesExpr(exprs(0), VectorExpressions.literalInt(exprs(1)))))
    e.injectFunction((
      FunctionIdentifier("count_in"),
      new ExpressionInfo(classOf[CountInExpr].getName, "count_in"),
      exprs => CountInExpr(exprs.head,
        exprs.tail.map(VectorExpressions.literalString))))
    e.injectFunction((
      FunctionIdentifier("subword_count"),
      new ExpressionInfo(classOf[SubwordCountExpr].getName, "subword_count"),
      exprs => SubwordCountExpr(exprs.head, SubwordVocab.Default)))
    e.injectFunction((
      FunctionIdentifier("subword_tokenize"),
      new ExpressionInfo(classOf[SubwordTokenizeExpr].getName, "subword_tokenize"),
      exprs => SubwordTokenizeExpr(exprs.head, SubwordVocab.Default)))
    // fuse aggregate(zip_with(...)) vector folds into native loops
    e.injectOptimizerRule(_ => graft.plans.FuseZipFold)
    // plan the custom top-k-per-group logical node (graft.ops.TopK)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}
