package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Document-level content filters: the Gopher/MassiveText quality-rule
  * battery (Rae et al. 2021, "Scaling Language Models: ... Gopher",
  * Appendix A), the intra-document repetition rules from the same
  * paper, and weighted blocklist scoring — the standard "does this page
  * even look like prose" gate a web-scale pretraining pipeline runs
  * before any dedup or LM scoring.
  *
  * Every stat is an integer count and every rule verdict an integer
  * cross-multiplication (`10*symbols < words`, never a float ratio), so
  * results hash-match across engines bit-for-bit. All three operators
  * are row-local scans — zero shuffles except [[repetitionStats]]'
  * single (id, n, gram) aggregate, whose key includes the document id
  * and therefore partitions perfectly at any corpus size.
  *
  * Reference scope note: the reference has no quality filters (its text
  * handling is per-row field parsing, `server/etl.py:89-99`); this is
  * §7.5 training-pipeline extension surface.
  */
object ContentFilter {

  /** The non-repetition Gopher rules over (possibly multi-line) text:
    *
    *   1. word count within [minWords, maxWords]
    *   2. mean word length within [meanLo, meanHi] chars
    *      (`meanLo*words <= wordchars <= meanHi*words`)
    *   3. symbol-to-word ratio (`#` + `...`) below maxSymbolMilli
    *   4. fraction of lines starting with a bullet (`- `) below
    *      maxBulletMilli
    *   5. fraction of lines ending with `...` below maxEllipsisMilli
    *   6. fraction of words containing an alphabetic char above
    *      minAlphaMilli
    *   7. at least minStop distinct required stopwords present
    *
    * Output: (id, n_words, n_lines, n_wordchars, n_symbols, n_bullet,
    * n_ellipsis_lines, n_alpha_words, n_stop_found, n_rules_failed,
    * keep). Counts are computed with codegen'd length arithmetic and
    * `regexp_count` (RE2-compatible patterns only: `(?m)` anchors, no
    * lookaround), not interpreted higher-order filters — the operator
    * sits in the hot path of every raw-crawl byte.
    */
  def gopherStats(docs: DataFrame, idCol: String, textCol: String,
                  stopwords: Seq[String] = Seq("the", "a", "and", "to", "of", "with", "that", "be"),
                  minWords: Long = 50L, maxWords: Long = 100000L,
                  meanLo: Long = 3L, meanHi: Long = 10L,
                  maxSymbolMilli: Long = 100L, maxBulletMilli: Long = 900L,
                  maxEllipsisMilli: Long = 300L, minAlphaMilli: Long = 800L,
                  minStop: Long = 2L): DataFrame = {
    require(stopwords.nonEmpty, "stopwords must be non-empty")
    val t = col(textCol)
    val base = docs
      .withColumn("gw", TextFns.tokens(t))
      .select(col(idCol).as("id"),
        size(col("gw")).cast("long").as("n_words"),
        // lines = newline count + 1 (length arithmetic, codegen'd)
        (length(t) - length(expr(s"replace($textCol, chr(10), '')")) + 1L).cast("long").as("n_lines"),
        length(regexp_replace(t, "\\s", "")).cast("long").as("n_wordchars"),
        expr(s"CAST((length($textCol) - length(replace($textCol, '#', ''))) " +
          s"+ ((length($textCol) - length(replace($textCol, '...', ''))) div 3) AS BIGINT)")
          .as("n_symbols"),
        regexp_count(t, lit("(?m)^- ")).cast("long").as("n_bullet"),
        regexp_count(t, lit("(?m)\\.\\.\\.$")).cast("long").as("n_ellipsis_lines"),
        // a "word with an alphabetic char": the greedy \S*[a-z]\S* match
        // consumes the whole token in both leftmost-first (Java) and
        // leftmost-longest (RE2) semantics, so the count is portable
        regexp_count(lower(t), lit("\\S*[a-z]\\S*")).cast("long").as("n_alpha_words"),
        // distinct required-stopword presence: iterate the BOUNDED
        // constant list, not the document (array_contains per stopword)
        size(filter(lit(stopwords.toArray),
          x => array_contains(col("gw"), x))).cast("long").as("n_stop_found"))
    // CALLER CONTRACT — pass a MATERIALIZED text column: a caller that
    // filters on `keep` has the predicate pushed to the scan with every
    // alias RE-EXPANDED (Catalyst's filter pushdown has no expression-
    // cost guard), and because array lambdas evaluate interpreted (no
    // codegen, no common-subexpression elimination) a DERIVED textCol
    // (e.g. a synthesized page) would be re-computed once per count
    // reference PER ROW — measured 90× wall on the q146 capstone. Over
    // a stored/staged column the same inlining is harmless (attribute
    // references, not expression trees). See Staging.stage.
    val rules = Seq(
      col("n_words") >= minWords && col("n_words") <= maxWords,
      lit(meanLo) * col("n_words") <= col("n_wordchars") &&
        col("n_wordchars") <= lit(meanHi) * col("n_words"),
      lit(1000L) * col("n_symbols") < lit(maxSymbolMilli) * col("n_words"),
      lit(1000L) * col("n_bullet") < lit(maxBulletMilli) * col("n_lines"),
      lit(1000L) * col("n_ellipsis_lines") < lit(maxEllipsisMilli) * col("n_lines"),
      lit(1000L) * col("n_alpha_words") > lit(minAlphaMilli) * col("n_words"),
      col("n_stop_found") >= minStop)
    base.withColumn("n_rules_failed",
        rules.map(r => when(r, 0L).otherwise(1L)).reduce(_ + _))
      .withColumn("keep", col("n_rules_failed") === 0L)
  }

  /** The Gopher intra-document repetition rules: for n in [2,4] the
    * character share of the highest-coverage word n-gram, for n in
    * [5,10] the character share of all duplicated word n-grams
    * (`sum over grams with count >= 2 of count * chars`). Shares are
    * exact milli-fractions of the canonical single-spaced text length;
    * "coverage" of a gram is `count * length(gram)` — deterministic
    * with no frequency-tie-break, and the monotone quantity the
    * thresholds actually bound. Overlapping occurrences can push a
    * share past 1000 (the standard published approximation — overlap-
    * exact coverage needs per-position dedup for no filtering benefit).
    *
    * keep ⟺ top2<200‰ top3<180‰ top4<160‰ and dup5..10 <
    * 150,140,130,120,110,100‰ (the paper's thresholds).
    *
    * Scale: ONE explode producing all nine n-gram streams tagged by n,
    * one (id, n, gram) count aggregate (map-side combining, key
    * contains the doc id — perfectly partitioned), one (id, n) rollup,
    * one pivot to wide. No joins, no skew (hot grams are per-document).
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val topNs = 2 to 4
    val dupNs = 5 to 10
    val topMax = Map(2 -> 200L, 3 -> 180L, 4 -> 160L)
    val dupMax = Map(5 -> 150L, 6 -> 140L, 7 -> 130L, 8 -> 120L, 9 -> 110L, 10 -> 100L)
    // ONE shuffle, before the explode: every aggregate below groups by
    // a key set CONTAINING the doc id, so hash-partitioning on id alone
    // satisfies all three clustering requirements (HashPartitioning ⊆
    // grouping keys) and the gram streams never cross the network — the
    // exchange carries the compact (id, tokens) rows, not the 9-way
    // exploded gram strings (previously three cascading exchanges whose
    // first carried every gram).
    val base = docs
      .withColumn("rw", TextFns.tokens(col(textCol)))
      .select(col(idCol).as("id"), col("rw"),
        length(array_join(col("rw"), " ")).cast("long").as("total"))
      .filter(col("total") > 0L)
      .repartition(Dedup.fanout(docs.sparkSession), col("id"))
    val gramArrays = (topNs ++ dupNs).map { n =>
      when(size(col("rw")) >= n,
        transform(sequence(lit(0), size(col("rw")) - n),
          i => struct(lit(n).as("n"), array_join(slice(col("rw"), i + 1, lit(n)), " ").as("g"))))
        .otherwise(array().cast("array<struct<n:int,g:string>>"))
    }
    val grams = base
      .select(col("id"), col("total"), explode(flatten(array(gramArrays: _*))).as("s"))
      .select(col("id"), col("total"), col("s.n").as("n"), col("s.g").as("g"))
    val perGram = grams.groupBy("id", "total", "n", "g").agg(count(lit(1)).as("cnt"))
    val perN = perGram.groupBy("id", "total", "n").agg(
      max(col("cnt") * length(col("g")).cast("long")).as("top_u"),
      sum(when(col("cnt") >= 2L, col("cnt") * length(col("g")).cast("long"))).as("dup_u"))
    val wideCols =
      topNs.map(n => max(when(col("n") === n, col("top_u"))).as(s"t$n")) ++
      dupNs.map(n => max(when(col("n") === n, col("dup_u"))).as(s"d$n"))
    val wide = perN.groupBy("id", "total").agg(wideCols.head, wideCols.tail: _*)
    val milli = (n: String) => expr(s"(1000 * coalesce($n, 0)) div total")
    val outCols = topNs.map(n => milli(s"t$n").as(s"top${n}_mb")) ++
      dupNs.map(n => milli(s"d$n").as(s"dup${n}_mb"))
    val keep = (topNs.map(n => milli(s"t$n") < topMax(n)) ++
      dupNs.map(n => milli(s"d$n") < dupMax(n))).reduce(_ && _)
    wide.select(col("id") +: outCols :+ keep.as("keep"): _*)
  }

  /** Weighted blocklist scoring: per document, occurrence counts of
    * each word/phrase pattern at word granularity, a weighted total,
    * and a blocked verdict at `threshold`. Matching is exact-token: the
    * document renders as `' ' + join(words, '  ') + ' '` (DOUBLE space
    * between words) and pattern p as `' ' + join(p_words, '  ') + ' '`,
    * so every occurrence owns its flanking spaces and adjacent
    * occurrences never share characters — plain non-overlapping
    * left-to-right `replace` length arithmetic counts exactly, in any
    * engine. Patterns are a BOUNDED operator constant (blocklists are
    * 10²-10⁴ entries); the scan is row-local codegen'd string work with
    * zero shuffles, so the operator cost is one pass over the corpus
    * regardless of cluster size.
    */
  def blocklistScore(docs: DataFrame, idCol: String, textCol: String,
                     patterns: Seq[(String, Long)], threshold: Long): DataFrame = {
    require(patterns.nonEmpty, "patterns must be non-empty")
    patterns.foreach { case (p, _) =>
      require(p.trim.nonEmpty && !p.contains("'"), s"bad blocklist pattern: '$p'") }
    val padded = concat(lit(" "), array_join(TextFns.tokens(col(textCol)), "  "), lit(" "))
    val base = docs.select(col(idCol).as("id"), padded.as("t"))
    val counts = patterns.zipWithIndex.map { case ((p, _), i) =>
      val pat = " " + p.trim.toLowerCase.split("\\s+").mkString("  ") + " "
      expr(s"CAST((length(t) - length(replace(t, '$pat', ''))) div ${pat.length} AS BIGINT)")
        .as(s"c$i")
    }
    val withCounts = base.select(col("id") +: counts: _*)
    val nHits = patterns.indices.map(i => col(s"c$i")).reduce(_ + _)
    val score = patterns.zipWithIndex.map { case ((_, w), i) => col(s"c$i") * lit(w) }.reduce(_ + _)
    withCounts.select(col("id"), nHits.as("n_hits"), score.as("score"),
      (score >= threshold).as("blocked"))
  }
}
