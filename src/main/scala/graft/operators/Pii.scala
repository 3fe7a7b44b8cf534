package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII SCRUBBING — the redaction stage every production corpus pipeline
  * runs before training (emails, credit-card numbers, IPs, phone
  * numbers → placeholder tokens), with per-category match counts for
  * the pipeline's compliance audit.
  *
  * Patterns are deliberately RE2-SAFE (no backreferences, no
  * lookaround, no \b) so the identical pattern string means the same
  * thing to Spark's java.util.regex and to RE2-based engines — the
  * same discipline as [[ContentFilter]]'s rule regexes. Categories
  * apply in a FIXED order (email → card → ip → phone), each counting
  * on the text as produced by the previous step — defined semantics
  * any engine replays exactly; the order is chosen so no earlier
  * category's placeholder can satisfy a later pattern (placeholders
  * contain letters; later patterns match digit runs).
  *
  * Scale shape: entirely ROW-LOCAL (regexp_count + regexp_replace are
  * codegen'd string expressions — no explode, no shuffle, no UDF); the
  * scan parallelizes embarrassingly at any corpus size.
  */
object Pii {

  /** RE2-safe category patterns, applied in this order. */
  val EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val CARD = "[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}"
  val IP = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val PHONE = "\\+?[0-9][0-9() -]{6,}[0-9]"

  /** The ordered (pattern, placeholder, count column) plan. */
  val STEPS: Seq[(String, String, String)] = Seq(
    (EMAIL, "<EMAIL>", "n_email"),
    (CARD, "<CARD>", "n_card"),
    (IP, "<IP>", "n_ip"),
    (PHONE, "<PHONE>", "n_phone"))

  /** Adds per-category match counts and the fully redacted text as
    * `clean`; all other columns pass through.
    */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val (out, cur) = STEPS.foldLeft((df, col(textCol))) {
      case ((d, t), (re, tok, cnt)) =>
        val stepped = d.withColumn(cnt, regexp_count(t, lit(re)))
          .withColumn(s"__$cnt", regexp_replace(t, re, tok))
        (stepped, col(s"__$cnt"))
    }
    out.withColumn("clean", cur)
      .drop(STEPS.map(s => s"__${s._3}"): _*)
  }
}
