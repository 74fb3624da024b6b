package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint:
  *
  *   h₀ = 0;  hᵢ = (31·hᵢ₋₁ + byteᵢ) mod 1_000_000_007
  *
  * A classic Rabin-Karp-style content fingerprint, as a native codegen'd
  * expression (no per-char closure allocation). The recurrence is pure
  * integer math, so the DuckDB oracle replays it exactly with
  * `LIST_REDUCE` over `STRING_SPLIT(text, '')` — byte-per-character
  * equivalence holds for ASCII corpora (the driver documents table);
  * non-ASCII would need codepoint folding on the Spark side too.
  *
  * Unlike md5 (q13's fingerprint), the rolling form extends to windowed
  * /streaming fingerprints: h(s[1..n]) can be updated incrementally as
  * bytes slide, which is what near-dup pipelines use for chunk-level
  * fingerprinting at scale.
  */
case class RollingHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  private final val M = 1000000007L

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (31L * h + (bytes(i) & 0xFF)) % M
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = (31L * $h + ($bytes[$i] & 0xFF)) % ${M}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}
