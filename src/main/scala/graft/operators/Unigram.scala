package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** UNIGRAM-LM tokenizer (the SentencePiece model family, Kudo 2018) —
  * the other production tokenizer besides BPE: given a piece vocabulary
  * with unigram costs, each word segments to the piece sequence of
  * MINIMUM total cost (Viterbi over the word's position DAG). BPE is a
  * bottom-up merge greedy; unigram is a global optimum per word — the
  * two disagree on real corpora, so an engine claiming tokenizer
  * coverage needs both. [[unigramEmRound]] adds the TRAINING side: one
  * hard-EM iteration (Viterbi E-step → piece-usage M-step → re-cost →
  * re-segment), the loop SentencePiece's trainer runs.
  *
  * Engine-exact formulation (every engine lands on the identical
  * segmentation, no floats anywhere):
  *   - piece costs are MILLI-BIT unigram surprisals
  *     cost(p) = mlog2(T) − mlog2(cnt(p)) over integer substring counts
  *     (T = Σ cnt over the vocabulary) — integer interpolated log2, the
  *     [[CorpusText.mlog2Sql]] idiom;
  *   - Viterbi state is ONE integer: comb = total_mb · 1000 + n_pieces
  *     (n_pieces < 1000 by the word-length bound), so `min(comb)` IS
  *     the lexicographic (cost, piece-count) tie-break — deterministic
  *     under any partitioning and replayable as plain SQL `min`;
  *   - the E-step path is reconstructed by PREDECESSOR RECOVERY: at
  *     each position k, the used edge is the min-j edge whose source
  *     best-value reproduces best[k] — a pure function of the best
  *     table, so both engines walk the identical path without the DP
  *     ever materializing choices.
  *
  * Spark-first decomposition (the [[Bpe]] architecture): the corpus
  * collapses ONCE to (word, wc) — the only corpus-scale pass; vocab
  * selection, the position-DAG edge table, the DP, and the EM walk all
  * run at VOCABULARY scale; the per-word result joins back to the
  * corpus token stream in one pass. The DP runs `maxWordLen` staged
  * rounds (position k's best from positions k−P..k−1 — each round one
  * vocabulary-sized join), O(1) plan depth via [[Staging]].
  *
  * Scale: a 100 TB corpus pays one tokenize + one join; rounds are
  * bounded by `maxWordLen` (a tokenizer convention, not a data bound —
  * SentencePiece caps candidate/word length the same way), and every
  * intermediate is vocabulary-sized. Words longer than `maxWordLen`
  * are EXCLUDED from training and segmentation (documented; the oracle
  * applies the same cap).
  *
  * Reference scope note: the reference has no tokenizer at all; this is
  * §7.5 training-pipeline extension surface.
  */
object Unigram {

  /** Candidate piece table: every substring of every distinct corpus
    * word up to `maxPieceLen` chars, with corpus-frequency-weighted
    * occurrence counts. (word table capped at `maxWordLen`.)
    */
  private def pieceCounts(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(col("word"), col("wc"),
        explode(sequence(lit(1), length(col("word")))).as("s"))
      .select(col("word"), col("wc"), col("s"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
      .filter(col("s") + col("l") - 1 <= length(col("word")))
      .select(expr("substring(word, s, l)").as("piece"), col("wc"))
      .groupBy("piece").agg(sum(col("wc")).as("cnt"))

  /** The distinct-word table (word, wc), capped at `maxWordLen`. */
  private def wordTable(docs: DataFrame, textCol: String, maxWordLen: Int): DataFrame =
    docs.select(explode(TextFns.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) <= maxWordLen)
      .groupBy("word").agg(count(lit(1)).as("wc"))

  /** Vocabulary = ALL single characters (so every word is segmentable)
    * ∪ the top-`vExtra` multi-char substrings by (count desc, piece) —
    * a TakeOrdered, not a global sort. Output (piece, cnt, cost_mb).
    */
  private def vocabulary(words: DataFrame, vExtra: Int, maxPieceLen: Int): DataFrame = {
    val pieces = pieceCounts(words, maxPieceLen)
    val chars = pieces.filter(length(col("piece")) === 1)
    val multi = pieces.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(vExtra)
    val voc = chars.unionByName(multi)
    val tot = voc.agg(sum(col("cnt")).as("t"))
    voc.crossJoin(broadcast(tot))
      .withColumn("cost_mb",
        expr(CorpusText.mlog2Sql("t")) - expr(CorpusText.mlog2Sql("cnt")))
      .select("piece", "cnt", "cost_mb")
  }

  /** Position-DAG edge GEOMETRY: j --piece--> k for every substring at
    * word offset j (0-based), k − j ≤ maxPieceLen. Vocabulary-sized.
    */
  private def edgeGeometry(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(col("word"), explode(sequence(lit(1), length(col("word")))).as("s"))
      .select(col("word"), col("s"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
      .filter(col("s") + col("l") - 1 <= length(col("word")))
      .select(col("word"), (col("s") - 1).as("j"), (col("s") + col("l") - 1).as("k"),
        expr("substring(word, s, l)").as("piece"))

  /** The Viterbi DP, collapsed to a PER-WORD array fold: the DP for a
    * word reads only that word's own edges (position k's best from
    * positions k−P..k−1), so the whole chain is word-local — one
    * per-word edge collect + one bounded `aggregate` expression replace
    * `maxWordLen` staged join+aggregate rounds (each a Spark job + a
    * vocabulary-table shuffle; the round latency, not the data, was the
    * cost at every scale). Output: (word, es, best) where best[k]
    * (1-indexed k+1) is the min comb settling position k — bit-identical
    * to the staged rounds because each entry is the same integer `min`
    * over the same edges, just evaluated locally.
    *
    * Every position of every word is reachable (the vocabulary contains
    * ALL single characters), so `best` is dense and the inner
    * `array_min` never sees an empty input.
    */
  private def bestArrays(edges: DataFrame): DataFrame =
    edges.groupBy("word")
      .agg(collect_list(struct(col("j"), col("k"), col("cost_mb"))).as("es"))
      .withColumn("best", expr("""aggregate(
          sequence(1, length(word)),
          array(CAST(0 AS BIGINT)),
          (acc, kk) -> array_append(acc, array_min(transform(
            filter(es, e -> e.k = kk),
            e -> (element_at(acc, e.j + 1) div 1000 + e.cost_mb) * 1000
                 + element_at(acc, e.j + 1) % 1000 + 1))))"""))

  /** (word, cost_mb, n_pieces) from the per-word DP: comb = best[len]. */
  private def segment(edges: DataFrame): DataFrame =
    bestArrays(edges)
      .select(col("word"),
        element_at(col("best"), length(col("word")) + 1).as("comb"))
      .select(col("word"), expr("comb div 1000").as("cost_mb"),
        expr("comb % 1000").as("n_pieces"))

  /** Per-doc rollup of per-word segmentation results. */
  private def rollup(docs: DataFrame, idCol: String, textCol: String,
                     seg: DataFrame): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(TextFns.tokens(col(textCol))).as("word"))
      .join(seg, Seq("word"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_pieces"),
        sum(col("cost_mb")).as("mb_total"))

  /** Dev hook for [[graft.tools.InnerPlans]]: the per-word DP's plan. */
  private[graft] def explainDp(docs: DataFrame, idCol: String, textCol: String,
                               vExtra: Int, maxPieceLen: Int, maxWordLen: Int): Unit = {
    val words = wordTable(docs, textCol, maxWordLen)
    val vocab = vocabulary(words, vExtra, maxPieceLen)
    segment(edgeGeometry(words, maxPieceLen)
        .join(broadcast(vocab.select(col("piece"), col("cost_mb"))), Seq("piece"))
        .select("word", "j", "k", "cost_mb"))
      .explain("formatted")
  }

  private def validate(vExtra: Int, maxPieceLen: Int, maxWordLen: Int): Unit = {
    require(maxPieceLen >= 1 && maxPieceLen <= 8,
      s"maxPieceLen must be in [1,8], got $maxPieceLen")
    require(maxWordLen >= maxPieceLen && maxWordLen <= 64,
      s"maxWordLen must be in [$maxPieceLen,64] (DP rounds = maxWordLen), got $maxWordLen")
    require(vExtra >= 0 && vExtra <= 100000, s"vExtra out of range: $vExtra")
  }

  /** Per-document unigram segmentation stats: (id, n_words, n_pieces,
    * mb_total) — token count after the length cap, total piece count,
    * and total segmentation cost in milli-bits. A digest-free scalar
    * rollup, so the result is oracle-hashable; any wrong cost, vocab
    * pick, or DP step anywhere in the corpus breaks it.
    */
  def unigramSegment(docs: DataFrame, idCol: String, textCol: String,
                     vExtra: Int, maxPieceLen: Int, maxWordLen: Int): DataFrame = {
    validate(vExtra, maxPieceLen, maxWordLen)
    // words feeds vocabulary AND edge geometry — stage once (one small
    // job; the corpus collapse never re-runs per consumer). The costed
    // vocabulary is bounded (chars + vExtra, a TakeOrdered result), so
    // the edge join BROADCASTS it: the substring fan-out never shuffles,
    // and the only corpus-scale shuffles left are the word collapse and
    // the per-doc rollup join.
    val words = Staging.stage(wordTable(docs, textCol, maxWordLen), "uni_words")
    val vocab = vocabulary(words.df, vExtra, maxPieceLen)
    val edges = edgeGeometry(words.df, maxPieceLen)
      .join(broadcast(vocab.select(col("piece"), col("cost_mb"))), Seq("piece"))
      .select("word", "j", "k", "cost_mb")
    val out = Staging.stage(
      rollup(docs, idCol, textCol, segment(edges)), "uni_out")
    words.delete()
    out.df
  }

  /** ONE HARD-EM TRAINING ROUND (the SentencePiece trainer loop body):
    *
    *   E-step — Viterbi-segment every distinct word under the initial
    *   substring-count costs, then recover each word's optimal path by
    *   predecessor recovery (min-j achieving edge per position, walked
    *   back from the word end in ≤ maxWordLen staged rounds);
    *
    *   M-step — piece usage = Σ word-frequency over path edges;
    *   add-one-smoothed re-cost over the SAME vocabulary
    *   (cost₁(p) = mlog2(T₁) − mlog2(usage+1), T₁ = Σ(usage+1)) — usage
    *   concentrates mass on pieces the model actually selects, the EM
    *   contraction;
    *
    *   then re-segment under the new costs.
    *
    * Output: per-doc stats of the POST-EM segmentation, same shape as
    * [[unigramSegment]] — so the whole E-step/M-step/re-segment loop
    * sits under one hash-checked result.
    */
  def unigramEmRound(docs: DataFrame, idCol: String, textCol: String,
                     vExtra: Int, maxPieceLen: Int, maxWordLen: Int): DataFrame = {
    validate(vExtra, maxPieceLen, maxWordLen)
    val words = Staging.stage(wordTable(docs, textCol, maxWordLen), "em_words")
    val vocab0 = vocabulary(words.df, vExtra, maxPieceLen)
    def costedEdges(vc: DataFrame): DataFrame =
      edgeGeometry(words.df, maxPieceLen)
        .join(broadcast(vc), Seq("piece"))
        .select("word", "j", "k", "cost_mb")
    val edges0 = costedEdges(vocab0.select(col("piece"), col("cost_mb")))

    // E-step, PER-WORD LOCAL (the [[bestArrays]] collapse, extended to
    // the path walk): with a word's own edge set and best array in one
    // row, predecessor recovery — "the used edge into position k is the
    // min-j edge whose source best reproduces best[k] exactly" — is a
    // bounded fold walking back from the word end, not maxWordLen
    // pred-join rounds. `chain` is the visited position sequence
    // [len, ..., 0]; the used edges are its consecutive pairs.
    val used = bestArrays(edges0)
      .withColumn("chain", expr("""aggregate(
          sequence(1, length(word)),
          array(length(word)),
          (acc, t) -> IF(element_at(acc, -1) <= 0, acc,
            array_append(acc, array_min(transform(
              filter(es, e -> e.k = element_at(acc, -1) AND
                (element_at(best, e.j + 1) div 1000 + e.cost_mb) * 1000
                + element_at(best, e.j + 1) % 1000 + 1
                = element_at(best, element_at(acc, -1) + 1)),
              e -> e.j)))))"""))
      .select(col("word"), explode(expr(
        """transform(sequence(1, size(chain) - 1),
             i -> named_struct('k', element_at(chain, i),
                               'j', element_at(chain, i + 1)))""")).as("e"))
      .select(col("word"), col("e.j").as("j"), col("e.k").as("k"))

    // M-step: usage-weighted re-cost over the same vocabulary, add-one
    val usage = used.join(words.df, Seq("word"))
      .select(expr("substring(word, j + 1, k - j)").as("piece"), col("wc"))
      .groupBy("piece").agg(sum(col("wc")).as("us"))
    val withUse = vocab0.select("piece")
      .join(usage, Seq("piece"), "left")
      .select(col("piece"), (coalesce(col("us"), lit(0L)) + 1).as("u1"))
    val tot1 = withUse.agg(sum(col("u1")).as("t"))
    val vocab1 = withUse.crossJoin(broadcast(tot1))
      .withColumn("cost_mb",
        expr(CorpusText.mlog2Sql("t")) - expr(CorpusText.mlog2Sql("u1")))
      .select("piece", "cost_mb")

    // re-segment under the new costs: the same per-word DP fold
    val out = Staging.stage(
      rollup(docs, idCol, textCol, segment(costedEdges(vocab1))), "em_out")
    words.delete()
    out.df
  }

  // ---------------------------------------------------------------- SQL

  private def mlog2(x: String) =
    s"((length(bin($x)) - 1) * 1000 + (($x - (CAST(1 AS BIGINT) << (length(bin($x)) - 1))) * 1000) // (CAST(1 AS BIGINT) << (length(bin($x)) - 1)))"

  /** Shared oracle base: capped word table, candidate counts, char-∪-
    * top-V vocabulary, costs (`vc`), edge geometry (`eg`) and costed
    * edges (`edges`).
    */
  private def baseSql(vExtra: Int, maxPieceLen: Int, maxWordLen: Int): String = s"""
      wrd AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS wc FROM (
          SELECT UNNEST(w) AS word FROM words)
        WHERE length(word) <= $maxWordLen GROUP BY 1),
      pieces AS MATERIALIZED (
        SELECT substr(word, CAST(s AS INTEGER), CAST(l AS INTEGER)) AS piece,
          CAST(SUM(wc) AS BIGINT) AS cnt
        FROM wrd, UNNEST(range(1, length(word) + 1)) AS u(s),
          UNNEST(range(1, $maxPieceLen + 1)) AS v(l)
        WHERE s + l - 1 <= length(word)
        GROUP BY 1),
      voc AS MATERIALIZED (
        SELECT piece, cnt FROM pieces WHERE length(piece) = 1
        UNION ALL
        SELECT piece, cnt FROM (
          SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rk
          FROM pieces WHERE length(piece) >= 2) WHERE rk <= $vExtra),
      tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM voc),
      vc AS MATERIALIZED (
        SELECT piece, ${mlog2("t")} - ${mlog2("cnt")} AS cost_mb FROM voc, tot),
      eg AS MATERIALIZED (
        SELECT word, s - 1 AS j, s + l - 1 AS k,
          substr(word, CAST(s AS INTEGER), CAST(l AS INTEGER)) AS piece
        FROM wrd, UNNEST(range(1, length(word) + 1)) AS u(s),
          UNNEST(range(1, $maxPieceLen + 1)) AS v(l)
        WHERE s + l - 1 <= length(word)),
      edges AS MATERIALIZED (
        SELECT e.word, e.j, e.k, vc.cost_mb FROM eg e JOIN vc ON e.piece = vc.piece)"""

  /** DP-round CTE chain `<p>0..<p>maxWordLen` over edge table `edgeRel`
    * (each round references up to `maxPieceLen` prior rounds —
    * MATERIALIZED, or DuckDB inlines them exponentially: the q122
    * lesson).
    */
  private def dpSql(edgeRel: String, p: String, maxPieceLen: Int,
                    maxWordLen: Int): String = {
    val b0 = s"""
      ${p}0 AS MATERIALIZED (SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS comb FROM wrd)"""
    val rounds = (1 to maxWordLen).map { k =>
      val lo = math.max(0, k - maxPieceLen)
      val prior = (lo until k).map(j => s"SELECT * FROM $p$j")
        .mkString("\n          UNION ALL ")
      s"""
      $p$k AS MATERIALIZED (
        SELECT e.word, $k AS pos,
          min((b.comb // 1000 + e.cost_mb) * 1000 + b.comb % 1000 + 1) AS comb
        FROM $edgeRel e JOIN ($prior) b
          ON e.word = b.word AND e.j = b.pos
        WHERE e.k = $k
        GROUP BY 1)"""
    }.mkString(",")
    b0 + "," + rounds
  }

  private def allbSql(p: String, maxWordLen: Int): String =
    (0 to maxWordLen).map(k => s"SELECT * FROM $p$k")
      .mkString("\n          UNION ALL ")

  /** Per-doc rollup from the final DP chain `<p>*`. */
  private def rollupSql(p: String, maxWordLen: Int): String = s"""
      seg AS MATERIALIZED (
        SELECT b.word, b.comb // 1000 AS cost_mb, b.comb % 1000 AS n_pieces
        FROM (${allbSql(p, maxWordLen)}) b
        JOIN wrd w ON b.word = w.word AND b.pos = length(w.word)),
      dt AS MATERIALIZED (
        SELECT doc_id, w[CAST(i + 1 AS INTEGER)] AS word
        FROM words, UNNEST(range(0, len(w))) AS t(i)
        WHERE len(w) > 0)
      SELECT dt.doc_id, CAST(count(*) AS BIGINT) AS n_words,
        CAST(SUM(seg.n_pieces) AS BIGINT) AS n_pieces,
        CAST(SUM(seg.cost_mb) AS BIGINT) AS mb_total
      FROM dt JOIN seg ON dt.word = seg.word
      GROUP BY 1"""

  /** The DuckDB replay of [[unigramSegment]]: candidate counts, the
    * vocabulary, costs, edges, all DP rounds, and the per-doc rollup.
    * `words` must provide (doc_id, w) as in ExtQueries.WORDS_SQL.
    */
  def oracleSql(vExtra: Int, maxPieceLen: Int, maxWordLen: Int): String =
    baseSql(vExtra, maxPieceLen, maxWordLen) + "," +
      dpSql("edges", "ub", maxPieceLen, maxWordLen) + "," +
      rollupSql("ub", maxWordLen)

  /** The DuckDB replay of [[unigramEmRound]]: the q132 chain, then
    * predecessor recovery, the ≤ maxWordLen walk rounds, usage
    * counting, add-one re-cost, the second DP, and the rollup — the
    * full E-step/M-step/re-segment loop as one generated SQL program.
    */
  def oracleEmSql(vExtra: Int, maxPieceLen: Int, maxWordLen: Int): String = {
    val walk = (1 to maxWordLen).map { t =>
      s"""
      emu$t AS MATERIALIZED (
        SELECT w.word, p.j, p.k
        FROM emw${t - 1} w JOIN pred p ON w.word = p.word AND w.pos = p.k),
      emw$t AS MATERIALIZED (
        SELECT word, j AS pos FROM emu$t WHERE j > 0)"""
    }.mkString(",")
    val usedUnion = (1 to maxWordLen).map(t => s"SELECT * FROM emu$t")
      .mkString("\n          UNION ALL ")
    baseSql(vExtra, maxPieceLen, maxWordLen) + "," +
      dpSql("edges", "ub", maxPieceLen, maxWordLen) + s""",
      allb AS MATERIALIZED (${allbSql("ub", maxWordLen)}),
      pred AS MATERIALIZED (
        SELECT e.word, e.k, min(e.j) AS j
        FROM edges e
        JOIN allb b ON e.word = b.word AND e.j = b.pos
        JOIN allb c ON e.word = c.word AND e.k = c.pos
        WHERE (b.comb // 1000 + e.cost_mb) * 1000 + b.comb % 1000 + 1 = c.comb
        GROUP BY 1, 2),
      emw0 AS MATERIALIZED (SELECT word, length(word) AS pos FROM wrd),""" +
      walk + s""",
      usage AS MATERIALIZED (
        SELECT substr(uu.word, CAST(uu.j + 1 AS INTEGER), CAST(uu.k - uu.j AS INTEGER)) AS piece,
          CAST(SUM(w.wc) AS BIGINT) AS us
        FROM ($usedUnion) uu JOIN wrd w ON uu.word = w.word
        GROUP BY 1),
      wu AS MATERIALIZED (
        SELECT v.piece, COALESCE(u.us, 0) + 1 AS u1
        FROM voc v LEFT JOIN usage u ON v.piece = u.piece),
      tot1 AS (SELECT CAST(SUM(u1) AS BIGINT) AS t FROM wu),
      vc1 AS MATERIALIZED (
        SELECT piece, ${mlog2("t")} - ${mlog2("u1")} AS cost_mb FROM wu, tot1),
      edges1 AS MATERIALIZED (
        SELECT e.word, e.j, e.k, vc1.cost_mb FROM eg e JOIN vc1 ON e.piece = vc1.piece),""" +
      dpSql("edges1", "vb", maxPieceLen, maxWordLen) + "," +
      rollupSql("vb", maxWordLen)
  }
}
