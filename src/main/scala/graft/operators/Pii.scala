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

  /** K-ANONYMIZATION by global generalization + residual suppression —
    * the privacy-compliance release gate (Sweeney 2002; the "can this
    * quasi-identifier combination single someone out" audit): every
    * quasi-identifier column carries a generalization LADDER of bucket
    * granularities (level ℓ renders the column as `value div
    * ladder(ℓ)`; all columns coarsen in lockstep), the operator picks
    * the SMALLEST level whose minimum equivalence-class size reaches
    * `k` (falling back to the coarsest), and any residual class still
    * below `k` at that level is SUPPRESSED — so the output satisfies
    * k-anonymity by construction. Returns one row per surviving class:
    * (level, <generalized qi columns>, n_rows).
    *
    * Deterministic end to end (integer floor buckets of non-negative
    * values, level choice from exact counts). Scale shape: ONE corpus
    * scan with a row-local ≤|ladder|× explode, one grouped count
    * (bounded by levels × distinct class tuples), then metadata-scale
    * min/choice arithmetic — the level pick is a broadcast of one row.
    */
  def kAnonymize(df: DataFrame, qis: Seq[(String, Seq[Long])],
                 k: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(qis.nonEmpty, "need at least one quasi-identifier")
    val levels = qis.head._2.size
    require(levels >= 1 && qis.forall(_._2.size == levels),
      "every quasi-identifier needs the same ladder length")
    require(qis.forall(_._2.forall(_ >= 1)), "granularities must be >= 1")
    val gCols = qis.map(_._1)
    // level-exploded generalized tuples, row-locally
    val lv = df.select(gCols.map(col): _*)
      .select(explode(array((0 until levels).map { l =>
        struct(lit(l.toLong).as("level") +:
          qis.map { case (c, ladder) =>
            expr(s"CAST(`$c` AS BIGINT) DIV ${ladder(l)}").as(s"g_$c")
          }: _*)
      }: _*)).as("t"))
      .select(col("t.level") +: gCols.map(c => col(s"t.g_$c")): _*)
    val sizes = lv.groupBy(col("level") +: gCols.map(c => col(s"g_$c")): _*)
      .agg(count(lit(1)).as("n_rows"))
    val chosen = sizes.groupBy("level").agg(min(col("n_rows")).as("mn"))
      .agg(coalesce(min(when(col("mn") >= k, col("level"))),
        lit(levels - 1L)).as("lvl"))
    sizes.join(broadcast(chosen), col("level") === col("lvl"))
      .filter(col("n_rows") >= k) // residual suppression
      .select(col("level") +: gCols.map(c => col(s"g_$c")) :+ col("n_rows"): _*)
  }
}
