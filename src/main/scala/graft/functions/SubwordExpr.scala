package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization — the real (BPE-style
  * inference) token counter the packing/chunking operators should run
  * on, replacing the `n_chars / 4` and whitespace-count heuristics.
  *
  * Semantics (chosen to be exactly replayable in ANSI SQL, so the
  * oracle can verify it with a recursive CTE over the same vocab):
  *  - the text splits into words on single spaces (empty words → 0
  *    tokens, spaces are not tokens);
  *  - within a word, scan left to right: at each position take the
  *    LONGEST vocab entry matching at that position (the standard
  *    greedy WordPiece/BPE inference rule); if none matches, the single
  *    character is its own token (char fallback, like byte-fallback
  *    vocabs);
  *  - matching is exact (case-sensitive) over Java/UTF-16 chars, which
  *    equals DuckDB's character semantics for all BMP text.
  *
  * Real vocabs are model artifacts loaded from files; [[SubwordVocab]]
  * ships a small deterministic default so both engines can embed it
  * literally. The trie is built once per operator instance (broadcast-
  * equivalent: it rides the serialized plan, ~bytes per entry) and the
  * per-row loop is a compiled trie walk inside whole-stage codegen —
  * no UDF, no per-row allocation for counting.
  *
  * [[SubwordCountExpr]] returns the token COUNT (long, the hot form —
  * packing/chunking only need counts); [[SubwordTokenizeExpr]] returns
  * the token array (inspection/downstream vocab work).
  */
final class SubwordTrie(vocab: Seq[String]) extends Serializable {
  require(vocab.nonEmpty, "empty vocab")
  require(vocab.forall(_.nonEmpty), "vocab entries must be non-empty")
  // full-text greedy scan ≡ per-word tokenization only if no vocab entry
  // can match across a space boundary
  require(vocab.forall(!_.contains(' ')), "vocab entries must not contain spaces")

  // flat array trie over chars: children as per-node HashMap — tiny
  // vocabs (10²–10⁵ entries) and read-only access after build
  private final class Node extends Serializable {
    val next = new java.util.HashMap[Character, Node](4)
    var terminal = false
  }
  private val root = new Node
  vocab.foreach { tok =>
    var n = root
    tok.foreach { c =>
      var ch = n.next.get(c)
      if (ch == null) { ch = new Node; n.next.put(c, ch) }
      n = ch
    }
    n.terminal = true
  }

  /** Length of the longest vocab entry matching `s` at `from`, or 0. */
  def longestMatch(s: String, from: Int): Int = {
    var n = root
    var i = from
    var best = 0
    while (i < s.length) {
      n = n.next.get(s.charAt(i))
      if (n == null) return best
      i += 1
      if (n.terminal) best = i - from
    }
    best
  }

  /** Greedy token count of a full text (spaces separate words). */
  def countTokens(text: String): Long = {
    var n = 0L
    var i = 0
    while (i < text.length) {
      if (text.charAt(i) == ' ') i += 1
      else {
        // token starting here: longest match within the word
        val m = longestMatch(text, i)
        val step = if (m > 0) m else 1
        // char fallback must not cross a space boundary; longestMatch
        // can't (vocab entries contain no spaces by construction), and
        // the fallback consumes exactly one non-space char
        i += step
        n += 1
      }
    }
    n
  }

  /** Greedy tokens of a full text, in order. */
  def tokenize(text: String): Array[UTF8String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < text.length) {
      if (text.charAt(i) == ' ') i += 1
      else {
        val m = longestMatch(text, i)
        val step = if (m > 0) m else 1
        out += UTF8String.fromString(text.substring(i, i + step))
        i += step
      }
    }
    out.toArray
  }
}

object SubwordTrie {
  // static entry points for generated code
  def count(trie: SubwordTrie, s: UTF8String): Long =
    trie.countTokens(s.toString)
  def tokens(trie: SubwordTrie, s: UTF8String): ArrayData =
    new GenericArrayData(trie.tokenize(s.toString).asInstanceOf[Array[Any]])
}

/** The default vocab: one deterministic literal list shared verbatim by
  * the Spark expression and the DuckDB oracle SQL. Mix of whole words,
  * sub-pieces, and PREFIX PAIRS (tab/table, va/val) so greedy
  * longest-match is actually exercised; letters outside it take the
  * char-fallback path.
  */
object SubwordVocab {
  val Default: Seq[String] = Seq(
    "the", "a", "row", "scan", "tab", "table", "va", "val", "ue",
    "par", "t", "fast", "slow", "key", "agg", "win", "dow", "col",
    "umn", "ord", "er", "sort", "mer", "ge", "bat", "ch", "sp", "ark",
    "data", "line", "cust", "omer", "qu", "ery", "fil", "ter", "gr",
    "oup", "vec", "tor", "sm", "all", "big", "str", "eam", "join",
    "ha", "sh", "query", "group")

  /** `(VALUES ('the'), ('a'), …)` body for the oracle's vocab CTE. */
  def sqlValues: String =
    Default.map(t => s"('${t.replace("'", "''")}')").mkString(", ")

  lazy val defaultTrie = new SubwordTrie(Default)
}

case class SubwordCountExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "subword_count"

  @transient private lazy val trie =
    if (vocab == SubwordVocab.Default) SubwordVocab.defaultTrie
    else new SubwordTrie(vocab)

  override protected def nullSafeEval(input: Any): Any =
    SubwordTrie.count(trie, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("subwordTrie", trie,
      classOf[SubwordTrie].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.SubwordTrie.count($trieRef, $s);")
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordCountExpr =
    copy(child = newChild)
}

case class SubwordTokenizeExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "subword_tokenize"

  @transient private lazy val trie =
    if (vocab == SubwordVocab.Default) SubwordVocab.defaultTrie
    else new SubwordTrie(vocab)

  override protected def nullSafeEval(input: Any): Any =
    SubwordTrie.tokens(trie, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("subwordTrie", trie,
      classOf[SubwordTrie].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.SubwordTrie.tokens($trieRef, $s);")
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordTokenizeExpr =
    copy(child = newChild)
}
