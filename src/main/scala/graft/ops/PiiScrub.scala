package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Configurable PII detection/redaction over text columns — the
  * library API behind q113. A scrub is an ORDERED rule list; order is
  * part of the contract (an email is redacted before the IP rule could
  * chew on its digits), and every rule is a plain codegen'd
  * `regexp_replace`/`regexp_count` — fully narrow, no UDF, the regex
  * compiles once per task.
  *
  * Pattern discipline (the cross-engine lesson from the oracle gate):
  * rules stay inside the regex subset where Java regex and RE2 agree —
  * character classes, bounded repetition, non-capturing groups, `\b`;
  * no alternation whose leftmost-first (Java) vs leftmost-longest
  * (RE2) resolution could differ, no backreferences or lookaround
  * (RE2 has neither). Custom rules should follow the same subset if
  * results must be portable across engines.
  */
object PiiScrub {

  /** One scrub rule: applied in list order, replaces every match. */
  final case class Rule(name: String, pattern: String, replacement: String)

  val email: Rule = Rule("email",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
  val ipv4: Rule = Rule("ipv4",
    "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>")
  val phone: Rule = Rule("phone",
    "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>")

  /** Default battery — email first (its local part may contain digit
    * runs), then IPv4 (dotted digits), then phone (dashed digits).
    */
  val defaultRules: Seq[Rule] = Seq(email, ipv4, phone)

  /** Match counts per rule, computed on the ORIGINAL text (detection
    * reports what was there, not what an earlier rule left behind).
    */
  def detect(text: Column, rules: Seq[Rule] = defaultRules): Seq[(String, Column)] =
    rules.map(r => r.name -> regexp_count(text, lit(r.pattern)).cast("long"))

  /** Apply every rule in order, replacing all occurrences. */
  def redact(text: Column, rules: Seq[Rule] = defaultRules): Column =
    rules.foldLeft(text)((acc, r) => regexp_replace(acc, r.pattern, r.replacement))
}
