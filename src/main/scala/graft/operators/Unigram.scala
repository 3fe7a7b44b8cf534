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
  * coverage needs both.
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
  *     under any partitioning and replayable as plain SQL `min`.
  *
  * Spark-first decomposition (the [[Bpe]] architecture): the corpus
  * collapses ONCE to (word, wc) — the only corpus-scale pass; vocab
  * selection, the position-DAG edge table, and the DP all run at
  * VOCABULARY scale; the per-word result joins back to the corpus
  * token stream in one pass. The DP runs `maxWordLen` staged rounds
  * (position k's best from positions k−P..k−1 — each round one
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

  /** Per-document unigram segmentation stats: (id, n_words, n_pieces,
    * mb_total) — token count after the length cap, total piece count,
    * and total segmentation cost in milli-bits. A digest-free scalar
    * rollup, so the result is oracle-hashable; any wrong cost, vocab
    * pick, or DP step anywhere in the corpus breaks it.
    */
  def unigramSegment(docs: DataFrame, idCol: String, textCol: String,
                     vExtra: Int, maxPieceLen: Int, maxWordLen: Int): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 8,
      s"maxPieceLen must be in [1,8], got $maxPieceLen")
    require(maxWordLen >= maxPieceLen && maxWordLen <= 64,
      s"maxWordLen must be in [$maxPieceLen,64] (DP rounds = maxWordLen), got $maxWordLen")
    require(vExtra >= 0 && vExtra <= 100000, s"vExtra out of range: $vExtra")
    val words = wordTable(docs, textCol, maxWordLen)
    val vocab = vocabulary(words, vExtra, maxPieceLen)

    // position-DAG edges: j --piece--> k for every vocab piece occurring
    // at word offset j (0-based), k − j ≤ maxPieceLen. Vocabulary-sized.
    val edges = Staging.stage(
      words
        .select(col("word"), explode(sequence(lit(1), length(col("word")))).as("s"))
        .select(col("word"), col("s"),
          explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
        .filter(col("s") + col("l") - 1 <= length(col("word")))
        .select(col("word"), (col("s") - 1).as("j"), (col("s") + col("l") - 1).as("k"),
          expr("substring(word, s, l)").as("piece"))
        .join(vocab.select(col("piece"), col("cost_mb")), Seq("piece"))
        .select("word", "j", "k", "cost_mb"),
      "uni_edges")

    // Viterbi: best(word, pos) as min comb; round k computes position k
    // from positions k−P..k−1 (each a previously STAGED frame — O(1)
    // plan depth, bounded lineage, the Bpe round discipline)
    val spark = docs.sparkSession
    import spark.implicits._
    val b0 = Staging.stage(
      words.select(col("word"), lit(0).as("pos"), lit(0L).as("comb")), "uni_b0")
    val bests = scala.collection.mutable.ArrayBuffer[Staging.Staged](b0)
    for (k <- 1 to maxWordLen) {
      val lo = math.max(0, k - maxPieceLen)
      val prior = (lo until k).map(j => bests(j).df).reduce(_ unionByName _)
      val bk = edges.df.filter(col("k") === k)
        .join(prior, edges.df("word") === prior("word") && col("j") === col("pos"))
        .groupBy(edges.df("word"))
        .agg(min(expr("(comb div 1000 + cost_mb) * 1000 + comb % 1000 + 1")).as("comb"))
        .select(col("word"), lit(k).as("pos"), col("comb"))
      bests += Staging.stage(bk, s"uni_b$k")
    }
    val allBest = bests.map(_.df).reduce(_ unionByName _)
    val seg = allBest.join(words, Seq("word"))
      .filter(col("pos") === length(col("word")))
      .select(col("word"), expr("comb div 1000").as("cost_mb"),
        expr("comb % 1000").as("n_pieces"))
    val docToks = docs.select(col(idCol).as("id"),
      explode(TextFns.tokens(col(textCol))).as("word"))
    val out = Staging.stage(
      docToks.join(seg, Seq("word"))
        .groupBy(col("id").as(idCol))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_pieces")).as("n_pieces"),
          sum(col("cost_mb")).as("mb_total")),
      "uni_out")
    (bests :+ edges).foreach(_.delete())
    out.df
  }

  /** The DuckDB replay of [[unigramSegment]]: candidate counts, the
    * char-∪-top-V vocabulary, milli-bit costs, the edge table, all
    * `maxWordLen` DP rounds as chained MATERIALIZED CTEs (each round
    * references up to `maxPieceLen` prior rounds — DuckDB would inline
    * them exponentially otherwise, the q122 lesson), and the per-doc
    * rollup. `words` must provide (doc_id, w) as in ExtQueries
    * .WORDS_SQL.
    */
  def oracleSql(vExtra: Int, maxPieceLen: Int, maxWordLen: Int): String = {
    def mlog2(x: String) =
      s"((length(bin($x)) - 1) * 1000 + (($x - (CAST(1 AS BIGINT) << (length(bin($x)) - 1))) * 1000) // (CAST(1 AS BIGINT) << (length(bin($x)) - 1)))"
    val base = s"""
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
      edges AS MATERIALIZED (
        SELECT e.word, e.j, e.k, vc.cost_mb FROM (
          SELECT word, s - 1 AS j, s + l - 1 AS k,
            substr(word, CAST(s AS INTEGER), CAST(l AS INTEGER)) AS piece
          FROM wrd, UNNEST(range(1, length(word) + 1)) AS u(s),
            UNNEST(range(1, $maxPieceLen + 1)) AS v(l)
          WHERE s + l - 1 <= length(word)) e
        JOIN vc ON e.piece = vc.piece),
      ub0 AS MATERIALIZED (SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS comb FROM wrd)"""
    val rounds = (1 to maxWordLen).map { k =>
      val lo = math.max(0, k - maxPieceLen)
      val prior = (lo until k).map(j => s"SELECT * FROM ub$j")
        .mkString("\n          UNION ALL ")
      s"""
      ub$k AS MATERIALIZED (
        SELECT e.word, $k AS pos,
          min((b.comb // 1000 + e.cost_mb) * 1000 + b.comb % 1000 + 1) AS comb
        FROM edges e JOIN ($prior) b
          ON e.word = b.word AND e.j = b.pos
        WHERE e.k = $k
        GROUP BY 1)"""
    }.mkString(",")
    val allB = (0 to maxWordLen).map(k => s"SELECT * FROM ub$k")
      .mkString("\n          UNION ALL ")
    base + "," + rounds + s""",
      seg AS MATERIALIZED (
        SELECT b.word, b.comb // 1000 AS cost_mb, b.comb % 1000 AS n_pieces
        FROM ($allB) b JOIN wrd w ON b.word = w.word AND b.pos = length(w.word)),
      dt AS MATERIALIZED (
        SELECT doc_id, w[CAST(i + 1 AS INTEGER)] AS word
        FROM words, UNNEST(range(0, len(w))) AS t(i)
        WHERE len(w) > 0)
      SELECT dt.doc_id, CAST(count(*) AS BIGINT) AS n_words,
        CAST(SUM(seg.n_pieces) AS BIGINT) AS n_pieces,
        CAST(SUM(seg.cost_mb) AS BIGINT) AS mb_total
      FROM dt JOIN seg ON dt.word = seg.word
      GROUP BY 1"""
  }
}
