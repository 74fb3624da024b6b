package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_sigs(words)` — the whole per-row MinHash pipeline as ONE
  * native expression: 3-word shingling, per-shingle h60, and the 8
  * permutation minima, fused into a single compiled loop.
  *
  * Value-identical to the declarative chain used by the batch q17 and
  * the previous `ops.MinHash.withBands` body
  *
  *   sh  = shingles(w, 3)                         -- distinct n-grams
  *   hs  = transform(sh, x -> h60(x) % P)
  *   sig_i = array_min(transform(hs, h -> (h·A_i + B_i) % P))
  *
  * with two structural savings that matter on the ingest hot path:
  *
  *  - `transform` / `array_min` are eval-only HigherOrderFunctions —
  *    they break whole-stage codegen and run an interpreted lambda
  *    frame per element. The chain above is NINE interpreted array
  *    passes per document (1 hash pass + 8 permutation passes), plus
  *    the materialized shingle and hash arrays between them. This
  *    expression is one codegen'd static call per row: no intermediate
  *    arrays, no boxing, minima updated in-loop.
  *  - dedup happens BEFORE hashing (a duplicate shingle's md5 is never
  *    computed), where the chain hashes every element `shingles` kept.
  *
  * A min over the distinct shingle set equals the min over the
  * multiset, so fusing dedup+hash+min cannot change any signature;
  * `n_shingles` is the exact distinct-string count (same
  * LinkedHashSet-on-bytes semantics as [[ShinglesExpr]], which is what
  * the DuckDB oracle's `LIST_DISTINCT` counts). Parity with the
  * declarative chain is pinned in MinHashSpec.
  *
  * Returns a struct (n_shingles, sig0..sig7); rows with fewer than 3
  * words yield NULL (callers filter `size(w) >= 3` first, matching the
  * chain's guard). Consumers must extract fields from ONE projected
  * struct column — `ops.MinHash.withBands` materializes the struct in
  * its own Project so CollapseProject cannot clone the call per field
  * (it refuses to duplicate non-cheap expressions referenced more than
  * once; whole-stage codegen's subexpression elimination would catch it
  * too, but the plan shape shouldn't depend on that).
  */
case class MinHashSigsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MinHashSigsExpr.Schema
  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigsExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w => {
      // compute() returns null for < 3 words; propagate as expression
      // nullability (nullSafeCodeGen only handles a null CHILD).
      s"""
         |${ev.value} = graft.functions.MinHashSigsExpr.compute($w);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): MinHashSigsExpr =
    copy(child = newChild)
}

object MinHashSigsExpr {

  /** Permutation family h_i(x) = (a_i·x + b_i) mod P, P = 2³¹−1 — the
    * catalog-wide single source of truth ([[graft.ops.MinHash]] and
    * `queries.TextOps` alias these).
    */
  val P = 2147483647L
  val As: IndexedSeq[Long] = Vector(7L, 13L, 31L, 61L, 127L, 251L, 509L, 1021L)
  val Bs: IndexedSeq[Long] = Vector(3L, 17L, 29L, 47L, 89L, 101L, 131L, 149L)

  val Schema: StructType = StructType(
    StructField("n_shingles", LongType, nullable = false) +:
      As.indices.map(i => StructField(s"sig$i", LongType, nullable = false)))

  /** Column wrapper (the GraftPlanShim round-trip), same pattern as
    * [[H60Expr.column]].
    */
  def column(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftPlanShim.columnOf(
      MinHashSigsExpr(org.apache.spark.sql.GraftPlanShim.expressionOf(c)))

  private val Sep = UTF8String.fromString(" ")
  private val aArr = As.toArray
  private val bArr = Bs.toArray

  /** One pass over the word array: build each 3-shingle, dedupe on the
    * exact UTF-8 bytes, hash new shingles once, fold the 8 minima.
    * Returns null when there are no shingles (< 3 words).
    */
  def compute(words: ArrayData): InternalRow = {
    val m = words.numElements()
    if (m < 3) return null
    val seen = new java.util.HashSet[UTF8String]()
    val mins = new Array[Long](8)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val parts = new Array[UTF8String](3)
    var i = 0
    while (i <= m - 3) {
      parts(0) = words.getUTF8String(i)
      parts(1) = words.getUTF8String(i + 1)
      parts(2) = words.getUTF8String(i + 2)
      val shingle = UTF8String.concatWs(Sep, parts: _*)
      if (seen.add(shingle)) {
        val h = H60Expr.hash(shingle) % P
        var k = 0
        while (k < 8) {
          val v = (h * aArr(k) + bArr(k)) % P
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](9)
    out(0) = seen.size().toLong
    var k = 0
    while (k < 8) { out(k + 1) = mins(k); k += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }
}
