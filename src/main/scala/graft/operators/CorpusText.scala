package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Corpus-level text operators beyond per-document signals: repeated-
  * segment removal (line-level dedup), n-gram language-model surprisal
  * scoring, and BM25 keyword retrieval — the remaining standard stages
  * of a web-scale training-data pipeline (CCNet/RefinedWeb-style
  * curation: strip boilerplate lines, filter by LM score, search the
  * corpus). All outputs are integer/fixed-point-exact so results
  * hash-match across engines.
  *
  * Reference scope note: the reference has no corpus operators at all
  * (its text handling is per-row field parsing, `server/etl.py:89-99`);
  * these belong to the §7.5 training-pipeline extension surface.
  */
object CorpusText {

  /** Repeated-segment removal — line-level dedup at `delim` granularity
    * (for web text, `delim = "\n"` strips boilerplate nav/footer lines
    * shared across pages; the mechanism is granularity-agnostic).
    * A segment is dropped from EVERY document when it occurs in more
    * than `maxDf` distinct documents; surviving segments reassemble in
    * original order. Documents whose segments are all dropped vanish
    * (CCNet drops them too).
    *
    * Output: (id, n_kept, n_dropped, clean_md5) — counts plus a digest
    * of the reassembled text (callers wanting the text itself use
    * [[cleanSegments]]).
    *
    * Scale: the segment-frequency table is segment-vocabulary-sized; the
    * probe is one shuffle join on the segment key; reassembly is one
    * grouped sort over each doc's own (bounded) segments. The
    * ultra-common segments — the skew hazard — are exactly the ones the
    * filter REMOVES, so the join's hot keys carry no reassembly cost.
    */
  def dropRepeatedSegments(docs: DataFrame, idCol: String, textCol: String,
                           delim: String, maxDf: Long): DataFrame = {
    val kept = cleanSegments(docs, idCol, textCol, delim, maxDf)
    val orig = segments(docs, idCol, textCol, delim)
      .groupBy(col("id")).agg(count(lit(1)).as("n_orig"))
    kept.select(col("id"), size(col("segs")).cast("long").as("n_kept"),
        md5(array_join(col("segs"), delim)).as("clean_md5"))
      .join(orig, Seq("id"))
      .select(col("id").as(idCol), col("n_kept"),
        (col("n_orig") - col("n_kept")).as("n_dropped"), col("clean_md5"))
  }

  /** EXACT-SUBSTRING span dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better" — the ExactSubstr
    * pass): any `k`-char window whose text occurs at least `minCount`
    * times ANYWHERE in the corpus (across documents or repeated within
    * one) marks a duplicated span; overlapping/chained marks merge into
    * maximal spans, and each document's cleaned text is what remains
    * after cutting every span. Finer-grained than [[
    * dropRepeatedSegments]] (which needs the duplication to align with
    * a delimiter): this catches boilerplate injected mid-line, license
    * headers, and templated sentences at ANY offset.
    *
    * Output: one row per input doc — (id, n_spans, dup_chars,
    * n_chars_clean, clean_digest, clean) with span-free docs passing
    * through whole (n_spans = 0). `clean_digest` is md5 of the cleaned
    * text, so the result is oracle-hashable; a fully-duplicated doc
    * cleans to the empty string (digest of ''), mirroring CCNet's
    * drop-empty convention downstream.
    *
    * Mechanics: positions explode to (id, pos, md5(window)); window
    * hashes seen ≥ minCount times form the mark set (one aggregate +
    * one semi-join); marks chain into islands with the classic
    * gap-vs-k lag test + running sum; islands aggregate to (start,
    * end) spans; cutting is ONE ordered higher-order fold per doc over
    * its own (bounded) span list — no per-char shuffling.
    *
    * Scale: the position table is corpus-chars-sized — the same volume
    * a tokenizer pass reads — and everything after the mark semi-join
    * is per-doc-bounded. The window hash is md5 TRUNCATED to 16 hex
    * chars (64 bits): the position table is staged and shuffled, so
    * hash width is most of its bytes, and truncation halves that
    * volume; both engines truncate the same digest, so span decisions
    * stay engine-identical (a 64-bit collision would merely merge two
    * window groups — identically on both sides). Per-position
    * md5(substring) costs len·k bytes hashed; the 100 TB upgrade is a
    * Karp-Rabin rolling-hash `Expression` (one multiply-add per
    * position), which changes this constant, not the dataflow. The
    * hash df table's hot keys are the duplicated windows themselves —
    * bounded by minCount semantics, AQE-splittable like every blocked
    * join here.
    */
  def dropDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                          k: Int, minCount: Long): DataFrame = {
    require(k >= 2, s"window k must be >= 2, got $k")
    require(minCount >= 2, s"minCount must be >= 2 (1 marks everything), got $minCount")
    val parallelism = Dedup.fanout(docs.sparkSession)
    val base = docs.select(col(idCol).as("id"), col(textCol).as("t"))
    val pos = base.repartition(parallelism, col("id"))
      .filter(length(col("t")) >= k)
      .select(col("id"), explode(sequence(lit(1), length(col("t")) - (k - 1))).as("pos"),
        col("t"))
      .select(col("id"), col("pos"),
        expr(s"substring(md5(substring(t, pos, $k)), 1, 16)").as("h"))
    // two consumers (df count + mark probe) → stage once; the staged
    // frame outlives this call because the result is lazy (the
    // Dedup.staged convention — exit cleanup owns the lifetime)
    val pst = Dedup.staged(pos, "span_pos")
    val dupH = pst.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount).select("h")
    val marks = pst.join(dupH, Seq("h"), "left_semi").select("id", "pos")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy("pos")
    val spans = marks
      .withColumn("newi",
        when(col("pos") > lag(col("pos"), 1, -2L * k).over(w) + (k - 1), 1).otherwise(0))
      .withColumn("isl", sum(col("newi")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("id", "isl")
      .agg(min(col("pos")).as("s"), (max(col("pos")) + (k - 1)).as("e"))
    val spanAgg = spans.groupBy("id").agg(
      sort_array(collect_list(struct(col("s"), col("e")))).as("sp"),
      count(lit(1)).cast("int").as("n_spans"),
      sum(col("e") - col("s") + 1).as("dup_chars"))
    val out = base.join(spanAgg, Seq("id"), "left")
      // one fold per doc: walk the ordered spans, keeping the text
      // between the previous span's end and the next span's start
      .withColumn("clean", expr(
        """CASE WHEN sp IS NULL THEN t ELSE
          |  aggregate(sp,
          |    named_struct('acc', cast('' as string), 'p', cast(1 as bigint)),
          |    (st, x) -> named_struct(
          |      'acc', concat(st.acc, substring(t, cast(st.p as int), cast(x.s - st.p as int))),
          |      'p', cast(x.e + 1 as bigint)),
          |    st -> concat(st.acc,
          |      substring(t, cast(st.p as int), cast(char_length(t) - st.p + 1 as int))))
          |END""".stripMargin))
    out.select(col("id"),
      coalesce(col("n_spans"), lit(0)).as("n_spans"),
      coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
      length(col("clean")).as("n_chars_clean"),
      md5(col("clean")).as("clean_digest"),
      col("clean"))
  }

  /** The segment-array form of [[dropRepeatedSegments]]: (id, segs) with
    * dropped segments removed, order preserved.
    */
  def cleanSegments(docs: DataFrame, idCol: String, textCol: String,
                    delim: String, maxDf: Long): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val segs = segments(docs, idCol, textCol, delim)
    val df = segs.groupBy("seg").agg(countDistinct(col("id")).as("df"))
    segs.join(df.filter(col("df") <= maxDf), Seq("seg"))
      .groupBy(col("id"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("seg")))),
        x => x.getField("seg")).as("segs"))
  }

  private def segments(docs: DataFrame, idCol: String, textCol: String,
                       delim: String): DataFrame =
    docs.select(col(idCol).as("id"),
        posexplode(filter(split(col(textCol), java.util.regex.Pattern.quote(delim)),
          s => length(s) > 0)).as(Seq("pos", "seg")))

  /** Integer-exact floor(log2(x)) for positive integer columns — the
    * engine-portable log idiom ([[Sketches]] uses it for the HLL
    * harmonic sum): bit length via `bin()`, no floating point anywhere.
    */
  private def log2i(c: Column): Column = (length(bin(c)) - 1).cast("long")

  /** Bigram language-model SURPRISAL scoring — the classic LM quality
    * filter (score the corpus with a model trained ON the corpus; docs
    * with abnormal surprisal are boilerplate or garbage). Per adjacent
    * token pair (w1, w2), add-one-smoothed surprisal in INTEGER log2
    * units:
    *
    *   surprise(w1,w2) = floor(log2(c(w1) + V)) − floor(log2(c(w1,w2) + 1))
    *
    * (≈ −log2 P(w2|w1); the floor-log2 formulation trades ~1-bit
    * resolution for bit-exact cross-engine reproducibility — float ln
    * sums are partition-order-dependent and never hash-match).
    * Output per doc: (id, n_bigrams, surprise_bits, bits_per_bigram)
    * where bits_per_bigram is the one row-local double division.
    *
    * Scale: unigram/bigram count tables are vocabulary-sized; scoring is
    * two shuffle joins of the corpus bigram stream against them (the
    * count tables broadcast when small); everything combines map-side.
    * Single-token documents have no bigrams and drop out.
    */
  def bigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      posexplode(TextFns.tokens(col(textCol))).as(Seq("pos", "w")))
    val uni = toks.groupBy(col("w").as("w1")).agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bigr = toks.withColumn("w2",
        lead(col("w"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy("pos")))
      .filter(col("w2").isNotNull)
      .select(col("id"), col("w").as("w1"), col("w2"))
    val pair = bigr.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    bigr.join(pair, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("id"),
        (log2i(col("c1") + col("v")) - log2i(col("c12") + 1)).as("bits"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("surprise_bits"))
      .withColumn("bits_per_bigram",
        col("surprise_bits").cast("double") / col("n_bigrams"))
  }

  /** SPAN-LEVEL quality localization — the fine-grained sibling of
    * [[bigramSurprisal]]'s per-doc score ("remove the worst paragraph"
    * filtering, not "drop the whole doc"): every `window`-bigram
    * sliding span accumulates integer surprisal bits, and each doc
    * reports its WORST span (max bits; earliest-start tie-break).
    * Output: (id, span_start, span_bits); docs with fewer than
    * window+1 tokens have no full span and drop.
    *
    * Scale: the scoring chain is [[bigramSurprisal]]'s (vocabulary-
    * sized count tables, corpus joined twice); the rolling sum and the
    * per-doc argmax are doc-keyed windows/aggregates — no cross-doc
    * state.
    */
  def worstSurprisalSpan(docs: DataFrame, idCol: String, textCol: String,
                         window: Int): DataFrame = {
    require(window >= 1 && window <= 1000, s"window must be in [1,1000], got $window")
    val toks = docs.select(col(idCol).as("id"),
      posexplode(TextFns.tokens(col(textCol))).as(Seq("pos", "w")))
    val uni = toks.groupBy(col("w").as("w1")).agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bigr = toks.withColumn("w2",
        lead(col("w"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy("pos")))
      .filter(col("w2").isNotNull)
      .select(col("id"), col("pos"), col("w").as("w1"), col("w2"))
    val pair = bigr.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val scored = bigr.join(pair, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("id"), col("pos"),
        (log2i(col("c1") + col("v")) - log2i(col("c12") + 1)).as("bits"))
    val wWin = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos").rowsBetween(0, window - 1)
    scored
      .withColumn("span_bits", sum(col("bits")).over(wWin))
      .withColumn("n_in", count(lit(1)).over(wWin))
      .filter(col("n_in") === window)
      .groupBy(col("id").as(idCol))
      .agg(max(struct(col("span_bits"), (-col("pos")).as("np"))).as("m"))
      .select(col(idCol), (-col("m.np")).cast("long").as("span_start"),
        col("m.span_bits").as("span_bits"))
  }

  /** Character-distribution ENTROPY per document, in MILLI-BITS — the
    * classic cheap garbage detector (binary junk and base64 blobs score
    * near-uniform-high; keyboard mashing and repeated-char padding score
    * low; natural language sits in a stable band). Exact integer form of
    * H = Σ (c/N)·log2(N/c):
    *
    *   ent_mb = Σ_ch c_ch · (mlog2(N) − mlog2(c_ch))   [then ÷N for the
    *   per-char rate via integer div]
    *
    * so the score hash-matches cross-engine. Empty docs emit no row.
    *
    * Scale: one explode to the char stream (the same volume any
    * tokenizer pass reads), two hash aggregates, one doc-keyed join —
    * no vocabulary table even needed since the histogram key is
    * (doc, char).
    */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hist = docs.select(col(idCol).as("id"),
        explode(expr(s"filter(split($textCol, ''), s -> s != '')")).as("ch"))
      .groupBy("id", "ch").agg(count(lit(1)).as("c"))
    val tot = hist.groupBy("id").agg(sum(col("c")).as("n"))
    hist.join(tot, Seq("id"))
      .select(col("id"), col("n"),
        (col("c") * (expr(mlog2Sql("n")) - expr(mlog2Sql("c")))).as("mb"))
      .groupBy(col("id").as(idCol))
      .agg(max(col("n")).as("n_chars"), sum(col("mb")).as("ent_mb"))
      .withColumn("mb_per_char", expr("ent_mb div n_chars"))
  }

  /** MILLI-BIT log2 for positive integer columns (the [[bm25TopK]]
    * idiom, factored out): 1000·(L−1) + (x − 2^(L−1))·1000 div 2^(L−1)
    * with L = bitlength(x) — linear interpolation between powers of
    * two, pure integer ops, monotone, max error 0.086 bits.
    */
  private[operators] def mlog2Sql(x: String): String =
    s"(cast(length(bin($x)) - 1 as bigint) * 1000" +
      s" + (($x - shiftleft(cast(1 as bigint), length(bin($x)) - 1)) * 1000)" +
      s" div shiftleft(cast(1 as bigint), length(bin($x)) - 1))"

  /** Interpolated KNESER-NEY bigram LM surprisal — the production form
    * of [[bigramSurprisal]]'s quality filter (CCNet scores with a
    * KN-smoothed LM; add-one badly underestimates rare-but-real
    * continuations). With discount D = `dQuarters`/4:
    *
    *   P(w2|w1) = max(c12 − D, 0)/c1  +  (D·N1+(w1·)/c1) · N1+(·w2)/B
    *
    * where N1+(w1·) = distinct continuations of w1, N1+(·w2) = distinct
    * contexts of w2 (the "novel-continuation" probability that makes KN
    * KN), and B = total distinct bigrams. Multiplying through by 4·c1·B
    * keeps every term integral:
    *
    *   P = [max(4·c12 − dq·1, 0)·B + dq·N1+(w1·)·N1+(·w2)] / (4·c1·B)
    *
    * and the surprisal in MILLI-bits is mlog2(denominator) −
    * mlog2(numerator) — integer end to end, so per-doc sums hash-match
    * cross-engine under any partitioning (the float formulation cannot).
    * Scored on the training corpus itself, every bigram has c12 ≥ 1, so
    * the numerator is always positive.
    *
    * Output per doc: (id, n_bigrams, kn_mb, mb_per_bigram) — total and
    * integer-mean milli-bits.
    *
    * Scale: four vocabulary-sized count tables (unigram, bigram,
    * forward/backward continuation counts) + one 1-row broadcast B; the
    * scoring stream joins each ONCE — same dataflow class as
    * [[bigramSurprisal]], no pairwise or iterative stage anywhere.
    * Numerators stay < 2^63 for corpora to ~10^8 tokens; past that the
    * same expressions lift to Decimal(38,0) (the [[graft.operators
    * .Sampling]] overflow discipline) without changing the dataflow.
    */
  def knSurprisal(docs: DataFrame, idCol: String, textCol: String,
                  dQuarters: Int = 3): DataFrame = {
    require(dQuarters >= 1 && dQuarters <= 3,
      s"discount must be 1..3 quarters (D in (0,1)), got $dQuarters")
    val toks = docs.select(col(idCol).as("id"),
      posexplode(TextFns.tokens(col(textCol))).as(Seq("pos", "w")))
    val bigr = toks.withColumn("w2",
        lead(col("w"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy("pos")))
      .filter(col("w2").isNotNull)
      .select(col("id"), col("w").as("w1"), col("w2"))
    val pair = bigr.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    // context count c1 = Σ_w2 c12 (bigram-consistent, excludes each
    // doc's final token — the KN convention for context totals)
    val ctx = pair.groupBy("w1").agg(sum(col("c12")).as("c1"),
      count(lit(1)).as("n1f"))
    val cont = pair.groupBy("w2").agg(count(lit(1)).as("n1b"))
    val totals = pair.agg(count(lit(1)).as("b"))
    bigr.join(pair, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .join(cont, Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("num", expr(
        s"greatest(4 * c12 - $dQuarters, cast(0 as bigint)) * b" +
          s" + $dQuarters * n1f * n1b"))
      .withColumn("den", expr("4 * c1 * b"))
      .select(col("id"),
        (expr(mlog2Sql("den")) - expr(mlog2Sql("num"))).as("mb"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("mb")).as("kn_mb"))
      .withColumn("mb_per_bigram", expr("kn_mb div n_bigrams"))
  }

  /** CCNet's head/middle/tail PERPLEXITY BUCKETS, per language: docs
    * rank by [[knSurprisal]] score within their language and split at
    * exact integer terciles (rank·3 vs n — no float quantiles), the
    * split CCNet uses to mix "cleanest third / middle / tail" with
    * different sampling rates. Output per (lang, bucket): doc count and
    * min/max/Σ of the per-bigram score. Per-language windows shuffle on
    * the language key — the grouping CCNet itself imposes — so no
    * global single-partition sort appears at scale.
    */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        langCol: String, dQuarters: Int = 3): DataFrame = {
    val scores = knSurprisal(docs, idCol, textCol, dQuarters)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("mb_per_bigram", idCol)
    val wn = org.apache.spark.sql.expressions.Window.partitionBy("lang")
    scores.join(docs.select(col(idCol), col(langCol).as("lang")), Seq(idCol))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("bucket",
        when(col("rn") * 3 <= col("n"), "head")
          .when(col("rn") * 3 <= col("n") * 2, "middle")
          .otherwise("tail"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("mb_per_bigram")).as("min_mb"),
        max(col("mb_per_bigram")).as("max_mb"),
        sum(col("mb_per_bigram")).as("sum_mb"))
  }

  /** The DuckDB CTE chain replaying [[knSurprisal]] (requires a `tok`
    * CTE of (doc_id, pos, term); ends in `kn`(doc_id, n_bigrams, kn_mb,
    * mb_per_bigram)) — factored out so composing queries (q130, q137)
    * share one replay.
    */
  def knOracleCtes(dQuarters: Int): String = {
    def mlog2(x: String) =
      s"((length(bin($x)) - 1) * 1000 + (($x - (CAST(1 AS BIGINT) << (length(bin($x)) - 1))) * 1000) // (CAST(1 AS BIGINT) << (length(bin($x)) - 1)))"
    s"""
        big AS (
          SELECT doc_id, term AS w1,
            lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
          FROM tok QUALIFY w2 IS NOT NULL),
        pair AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM big GROUP BY 1, 2),
        ctx AS (
          SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
            CAST(count(*) AS BIGINT) AS n1f
          FROM pair GROUP BY 1),
        cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1b FROM pair GROUP BY 1),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS b FROM pair),
        knsc AS (
          SELECT bg.doc_id,
            GREATEST(4 * p.c12 - $dQuarters, 0) * t.b + $dQuarters * x.n1f * n.n1b AS num,
            4 * x.c1 * t.b AS den
          FROM big bg
          JOIN pair p ON bg.w1 = p.w1 AND bg.w2 = p.w2
          JOIN ctx x ON bg.w1 = x.w1
          JOIN cont n ON bg.w2 = n.w2
          CROSS JOIN tot t),
        knmb AS (SELECT doc_id, ${mlog2("den")} - ${mlog2("num")} AS mb FROM knsc),
        kn AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
            CAST(SUM(mb) AS BIGINT) AS kn_mb,
            CAST(SUM(mb) // count(*) AS BIGINT) AS mb_per_bigram
          FROM knmb GROUP BY 1)"""
  }

  /** BM25 top-k keyword retrieval over the corpus, in FIXED-POINT
    * integer arithmetic end to end (k1 = 1.2 and b = 0.75 as
    * milli-units; one integer division per (doc, term)) — deterministic
    * under any partitioning and hash-matchable cross-engine, unlike the
    * float formulation whose per-term additions reorder.
    *
    * IDF needs SUB-bit resolution (stopword-vs-content idf ratios are
    * often < 2×, which floor-log2 cannot see), so it uses MILLI-BIT
    * log2: mlog2(x) = 1000·(L−1) + (x − 2^(L−1))·1000 div 2^(L−1)
    * with L = bitlength(x) — linear interpolation between powers of
    * two, pure integer ops, monotone, max error 0.086 bits:
    *
    *   r(t)          = (N − df + 1) · 2²⁰ div (df + 1)
    *   idf_mb(t)     = max(mlog2(r) − 20000, 0)                     [milli-bits]
    *   rel_m(D)      = dl(D)·10⁶ div avgdl_m                        [dl/avgdl in milli]
    *   norm_m(D)     = 1000 − b_m + (b_m · rel_m) div 1000
    *   score_µ(D,t)  = idf_mb(t) · (tf · (k1_m + 1000) · 10⁶)
    *                   div (tf · 1000 + (k1_m · norm_m) div 1000) div 1000
    *
    * Output: top-`k` docs by Σ score_µ (ties → lower doc id), with the
    * score in integer micro-units.
    *
    * Scale: df/avgdl are aggregate-time constants; the term postings
    * for the (tiny) query term set are semi-join-pruned before scoring,
    * so cost is Σ df(query terms), never corpus-wide; the final top-k
    * is a TakeOrdered, not a global sort.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    val K1m = 1200L; val Bm = 750L
    val toks = docs.select(col(idCol).as("id"),
      explode(TextFns.tokens(col(textCol))).as("w"))
    val dl = toks.groupBy("id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("n_toks"))
      .select(col("n_docs"), expr("(n_toks * 1000) div n_docs").as("avgdl_m"))
    val qt = toks.filter(col("w").isin(queryTerms: _*))
    val tf = qt.groupBy("id", "w").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("w").agg(count(lit(1)).as("df"))
    // every division below is integer `div` — Spark's `/` on longs is
    // DOUBLE division, whose truncation can disagree with floor at the
    // representability edge; `div` is the exact engine-portable form
    tf.join(broadcast(dfT), Seq("w"))
      .join(dl, Seq("id"))
      .crossJoin(broadcast(stats))
      .withColumn("r", expr("((n_docs - df + 1) * 1048576) div (df + 1)"))
      .withColumn("lb", expr("length(bin(r)) - 1"))
      .withColumn("pw", expr("shiftleft(cast(1 as bigint), cast(lb as int))"))
      .withColumn("idf_mb",
        expr("greatest(cast(lb as bigint) * 1000 + ((r - pw) * 1000) div pw - 20000, 0)"))
      .withColumn("rel_m", expr("(dl * 1000000) div avgdl_m"))
      .withColumn("norm_m", expr(s"1000 - $Bm + ($Bm * rel_m) div 1000"))
      .withColumn("score_u", expr(
        s"idf_mb * ((tf * ${K1m + 1000} * 1000000) div (tf * 1000 + ($K1m * norm_m) div 1000)) div 1000"))
      .groupBy(col("id").as(idCol))
      .agg(sum(col("score_u")).as("score_u"), count(lit(1)).as("n_terms"))
      .orderBy(col("score_u").desc, col(idCol))
      .limit(k)
  }

  /** TRIGRAM SUBSTRING SEARCH — the pg_trgm / code-search architecture
    * for queries word indexes cannot serve (arbitrary substrings,
    * including ones spanning word boundaries): the corpus indexes its
    * distinct character 3-grams once (posting lists bounded by the
    * trigram vocabulary, ≤ |alphabet|³ keys); a query probes only ITS
    * OWN pattern's trigrams, candidates are docs containing ALL of
    * them (an intersection-count semi-join — never a corpus text
    * scan), and only candidates pay the exact `contains` verify.
    * Output: (id, verified) for every candidate — the pruning ratio is
    * visible, and verified=true is exactly the substring-match set.
    *
    * Patterns shorter than 3 chars degrade to the exact scan
    * (documented; no trigram exists to probe).
    */
  def trigramSearch(docs: DataFrame, idCol: String, textCol: String,
                    pattern: String): DataFrame = {
    require(pattern.nonEmpty, "pattern must be non-empty")
    if (pattern.length < 3)
      return docs.filter(col(textCol).contains(pattern))
        .select(col(idCol).as("id"), lit(true).as("verified"))
    val pats = pattern.sliding(3).toSeq.distinct
    // intersect BEFORE the dedup exchange: the broadcast join against
    // the (bounded) pattern-trigram set runs inside the explode's
    // codegen stage, so the only shuffle carries the few surviving
    // (id, pattern-trigram) rows — the previous order paid a full
    // corpus-trigram-stream shuffle for the distinct first. distinct ∘
    // equi-join ≡ equi-join ∘ distinct here (the build side is
    // distinct), so the postings-intersection result is unchanged.
    val patDf = docs.sparkSession.createDataFrame(pats.map(Tuple1(_))).toDF("tri")
    val docTris = docs
      .select(col(idCol).as("id"), col(textCol).as("t"),
        explode(sequence(lit(1), length(col(textCol)) - 2)).as("s"))
      .select(col("id"), expr("substring(t, s, 3)").as("tri"))
      .join(broadcast(patDf), Seq("tri"))
      .distinct()
    val cands = docTris
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === pats.size)
      .select(col("id"))
    // only candidates pay the text fetch + exact verify
    cands.join(docs.select(col(idCol).as("id"), col(textCol).as("t")), Seq("id"))
      .select(col("id"), col("t").contains(pattern).as("verified"))
  }

  /** POSITIONAL PHRASE SEARCH over the word stream — the inverted-index
    * companion of [[trigramSearch]] for exact word-sequence queries:
    * each phrase word's postings (doc, pos) join on positional
    * ADJACENCY (p_{i+1} = p_i + 1), so only docs containing the words
    * at consecutive positions survive; the corpus text is never
    * rescanned. Output: (id, n_occurrences) per matching doc.
    *
    * Scale shape: postings are semi-join-pruned to the phrase's words
    * before any join (the BM25 q107 discipline); the adjacency joins
    * are |phrase|−1 equi-joins on (doc, pos) over those pruned lists.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val toks = docs.select(col(idCol).as("id"),
        posexplode(TextFns.tokens(col(textCol))).as(Seq("pos", "term")))
    val first = toks.filter(col("term") === phrase.head)
      .select(col("id"), col("pos"))
    val matches = phrase.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (w, i)) =>
        acc.join(
          toks.filter(col("term") === w)
            .select(col("id"), (col("pos") - i).as("pos")),
          Seq("id", "pos"))
    }
    matches.groupBy(col("id")).agg(count(lit(1)).as("n_occurrences"))
  }

  /** INTRA-DOCUMENT line dedup (the other half of CCNet's line-level
    * cleaning — [[segmentDedup]] drops lines frequent ACROSS the
    * corpus; this drops REPEATS of a line WITHIN one document, keeping
    * the first occurrence and reconstructing the text in original
    * order): per doc, (id, n_lines, n_kept, clean).
    *
    * 100 TB shape: one shuffle on the doc id (lines of a doc
    * co-locate), one window + one aggregate inside it; the collect_list
    * is per-DOCUMENT (bounded by a doc's own line count — the natural
    * unit), never corpus-scale. No cross-document state at all, so the
    * operator parallelizes per-doc embarrassingly.
    */
  def dedupLinesWithinDoc(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"), col("line"))
    docs.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("minp", min(col("pos")).over(w))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("pos") === col("minp"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(
            when(col("pos") === col("minp"), struct(col("pos"), col("line"))))),
          p => p("line")), "\n").as("clean"))
  }

  /** Block-tag boundary pattern for [[mainContentBlocks]] — RE2-safe
    * (inline flag, non-capturing group, character class; no
    * backreferences) so the oracle splits identically.
    */
  private[graft] val BlockSplitRe =
    "(?i)</?(?:p|div|li|h[1-6]|br|td|th|tr|ul|ol|table|section|article|header|footer|nav)[^>]*>"

  /** MAIN-CONTENT extraction (the trafilatura/jusText/Boilerpipe role —
    * what CCNet-style pipelines run between raw HTML and text filters):
    * split each page at block-level tag boundaries, score every block
    * by TEXT LENGTH and LINK DENSITY (anchor-text chars ·1000 / text
    * chars — nav/menu/footer blocks are nearly all link text), and keep
    * blocks with ≥ `minChars` of text at ≤ `maxLinkMilli` density. The
    * integer cross-multiplied density and the shared [[TextFns
    * .stripHtml]] pipeline keep every verdict engine-exact. Anchor text
    * is measured over the block's `<a>…</a>` inner spans joined by a
    * single space (so n anchors contribute n−1 separator chars — the
    * documented metric).
    *
    * Output one row per doc: total/kept block counts, kept text chars,
    * and the md5 of the kept blocks' texts in page order (the q105
    * digest discipline). Everything is row-local until the per-DOC
    * aggregate (collect_list bounded by a page's own block count).
    */
  def mainContentBlocks(docs: DataFrame, idCol: String, htmlCol: String,
                        minChars: Int, maxLinkMilli: Int): DataFrame = {
    require(minChars >= 1, s"minChars must be >= 1, got $minChars")
    require(maxLinkMilli >= 0 && maxLinkMilli <= 1000,
      s"maxLinkMilli must be in [0,1000], got $maxLinkMilli")
    val blocks = docs.select(col(idCol).as("id"),
      posexplode(split(col(htmlCol), BlockSplitRe)).as(Seq("pos", "raw")))
    val scored = blocks
      .withColumn("btext", TextFns.stripHtml(col("raw")))
      .withColumn("tlen", length(col("btext")).cast("long"))
      .withColumn("llen", length(TextFns.stripHtml(array_join(
        expr("regexp_extract_all(raw, '(?is)<a[^>]*>(.*?)</a>', 1)"), " ")))
        .cast("long"))
      .withColumn("kept", col("tlen") >= minChars &&
        col("llen") * 1000 <= lit(maxLinkMilli.toLong) * col("tlen"))
    scored.groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("tlen")).otherwise(0L)).as("kept_chars"),
        md5(array_join(transform(
          array_sort(collect_list(
            when(col("kept"), struct(col("pos"), col("btext"))))),
          p => p("btext")), " ")).as("content_md5"))
  }
}
