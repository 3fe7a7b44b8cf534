package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String / key-derivation / text-analysis functions. Everything here is
  * a composition of codegen'd builtins — no UDFs — so the expressions
  * stay inside whole-stage codegen and scale linearly with input bytes.
  */
object TextFns {

  /** Join-key normalization: strip spaces, lowercase — applied on BOTH
    * sides of the torrent↔recording equi-join (reference
    * `server/etl.py:206,251`).
    */
  def normalizeKey(c: Column): Column = lower(regexp_replace(c, " ", ""))

  /** Day partition key `yyyy_MM_dd` (reference `'%Y_%m_%d'`,
    * `server/etl.py:67,96`).
    */
  def dayKey(c: Column): Column = date_format(c, "yyyy_MM_dd")

  /** Derived equi-join time key `yy.MM.dd HH-mm-ss` (reference
    * `'%y.%m.%d %H-%M-%S'`, `server/etl.py:251`).
    */
  def timeKey(c: Column): Column = date_format(c, "yy.MM.dd HH-mm-ss")

  /** 5-way resolution classifier with `'AVI'` default (reference
    * `server/etl.py:208-234`): literal match on the token extracted from
    * the torrent link between `TVOON_DE` and `otrkey.torrent`.
    */
  def classifyResolution(tok: Column): Column =
    when(tok === ".mpg.HD.avi.", "HD")
      .when(tok === ".mpg.HQ.avi.", "HQ")
      .when(tok === ".mpg.avi.", "DIVX")
      .when(tok === ".mpg.mp4.", "MP4")
      .when(tok === ".mpg.HD.ac3.", "HD.AC3")
      .otherwise("AVI")

  /** Substring-between extraction done with one regex instead of the
    * reference's split-chains (reference `server/etl.py:209`).
    */
  def resolutionToken(link: Column): Column =
    regexp_extract(link, "TVOON_DE(.*)otrkey\\.torrent", 1)

  /** Lowercased whitespace tokens, empties dropped.
    *
    * No higher-order `filter` (HOFs evaluate interpreted, outside
    * whole-stage codegen — they dominated the round-1 text-path profile).
    * Edges are trimmed with a REGEX (`trim()` strips only 0x20 spaces —
    * a tab/newline-edged string would otherwise split into empty edge
    * tokens); after that, a `\s+` split of a non-empty string can
    * produce no empty elements, and the all-whitespace/empty document
    * yields an empty array via the `when`.
    */
  def tokens(c: Column): Column = {
    val t = regexp_replace(c, "^\\s+|\\s+$", "")
    when(t.isNull || length(t) === 0, array().cast("array<string>"))
      .otherwise(split(lower(t), "\\s+"))
  }

  /** Distinct word n-gram shingles (space-joined) over an ALREADY
    * MATERIALIZED token-array column. Passing `tokens(text)` inline here
    * would be quadratic: higher-order functions evaluate interpreted, and
    * an inlined subexpression is re-evaluated per lambda element — i.e.
    * one regex split of the whole document PER SHINGLE. Materialize the
    * tokens with `withColumn` first (see [[graft.operators.Dedup]]).
    * Guarded so documents shorter than `n` words yield an empty array (a
    * bare `sequence(0, size-n)` would count DOWN for negative spans).
    */
  def shinglesOf(w: Column, n: Int): Column =
    when(size(w) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), size(w) - (n - 1)),
          i => array_join(slice(w, i, lit(n)), " "))))

  /** Canonical-text fingerprint: lowercase, strip non-alphanumerics,
    * collapse runs of spaces, md5. Identical duplicate detection that is
    * robust to whitespace/punctuation jitter.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " ")))

  /** Tiny per-language stopword lexicons for the n-gram/stopword
    * language-ID heuristic. Deterministic and portable (pure set
    * membership counts).
    */
  val langLexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "ein", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des"),
    "es" -> Seq("el", "los", "las", "es", "un", "una", "y", "con")
  )

  /** Stopword-hit count for one lexicon, computed directly over the raw
    * text with ONE codegen'd `regexp_count` instead of a higher-order
    * `filter` over the token array (interpreted, allocation-heavy).
    * Token semantics are preserved exactly: a "token" is a maximal
    * non-whitespace run, so a lexicon word counts iff it is bounded by
    * whitespace or string edge on both sides (constant-length lookarounds).
    */
  def lexiconHits(text: Column, lexicon: Seq[String]): Column =
    regexp_count(lower(text),
      lit("(?<![^\\s])(?:" +
        lexicon.map(java.util.regex.Pattern.quote).mkString("|") +
        ")(?![^\\s])")).cast("int")

  /** PII patterns, deliberately restricted to constructs with identical
    * semantics in Java regex and RE2 (character classes, `\b`, bounded
    * repetition) so a DuckDB oracle applies the very same scrub.
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Redact emails and phone-shaped tokens — the scrub every
    * web-scraped training corpus runs before anything is retained.
    * Pure codegen'd `regexp_replace` chain (replaces ALL matches);
    * extend the chain per PII class.
    */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  /** HTML → text extraction (the step-0 of every web-crawl pipeline):
    * drop script/style payloads and comments, strip remaining tags,
    * decode the common entities, collapse whitespace. Deliberately
    * restricted to regex constructs with identical semantics in Java
    * regex and RE2 — inline (?is) flags, non-greedy spans, character
    * classes; NO backreferences (RE2 lacks them, hence separate
    * script/style patterns) — so a DuckDB oracle can replay the exact
    * pipeline. Entity order matters: `&amp;` decodes LAST so
    * `&amp;lt;` yields the literal text `&lt;`, and entities decode
    * AFTER tag-stripping so a decoded `&lt;tag&gt;` stays visible text.
    * All stages are codegen'd regexp_replace/replace — no UDF.
    */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (e, v)) => replace(acc, lit(e), lit(v)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Accent-fold map — an EXPLICIT latin-1/latin-extended table applied
    * via `translate` (a single-char map both Spark and SQL engines
    * implement with identical semantics), deliberately NOT an NFD/
    * combining-mark pass: library Unicode normalizers differ across
    * engines, an explicit table cannot.
    */
  val ACCENT_FROM = "àáâãäåèéêëìíîïòóôõöùúûüýçñšž"
  val ACCENT_TO = "aaaaaaeeeeiiiiooooouuuuycnsz"

  /** CCNet-style text CANONICALIZATION for dedup/langid: lowercase →
    * accent fold → strip everything but [a-z0-9] and whitespace →
    * collapse whitespace → trim. Two texts differing only in case,
    * accents, or punctuation normalize to the same string — the key
    * under which near-identical web pages become EXACT duplicates.
    * Row-local codegen'd string ops.
    */
  def canonicalize(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(translate(lower(c), ACCENT_FROM, ACCENT_TO),
        "[^a-z0-9\\s]", ""),
      "\\s+", " "))
}
