package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** WORDPIECE tokenizer (the BERT tokenizer family, Schuster & Nakajima
  * 2012 / Devlin et al. 2018) — greedy LONGEST-MATCH-FIRST segmentation
  * with position-role vocabulary: word-INITIAL pieces and CONTINUATION
  * pieces ("##x" in BERT rendering) are distinct vocabulary entries,
  * and each word segments left-to-right by consuming the longest piece
  * valid in the current role. Completes the production tokenizer
  * triple: BPE ([[Bpe]], bottom-up merges), unigram-LM ([[Unigram]],
  * global Viterbi optimum), WordPiece (greedy longest-match) — three
  * families that genuinely disagree on real corpora.
  *
  * Engine-exact formulation: greedy choice = `max(k)` over the valid
  * edges at the current position — one integer aggregate, no floats,
  * no tie possible (edge ends are distinct). Each word's segmentation
  * is captured as a CUT-POSITION BITMASK (Σ 2^k over piece end
  * positions k ≤ maxWordLen ≤ 64... bounded at 16 here), which
  * uniquely identifies the piece sequence — so the per-doc rollup
  * hashes the exact segmentation, not just piece counts.
  *
  * Spark-first decomposition (the [[Bpe]]/[[Unigram]] architecture):
  * the corpus collapses ONCE to (word, wc); vocabulary selection, the
  * role-tagged edge table, and the ≤ maxWordLen greedy rounds all run
  * at VOCABULARY scale (each round one join + one aggregate, staged for
  * O(1) plan depth); the per-word result joins back to the corpus
  * token stream in one pass. A 100 TB corpus pays one tokenize + one
  * join — rounds are bounded by the word-length cap, a tokenizer
  * convention, not a data bound.
  *
  * Because the vocabulary is built FROM the corpus, every (char, role)
  * occurrence is vocabulary-covered and greedy always finds a match —
  * the [UNK] fallback of deployment-time WordPiece never fires here
  * (it would fire only when segmenting NEW text under a fixed vocab);
  * words longer than `maxWordLen` are excluded from vocabulary and
  * segmentation (documented; the oracle applies the same cap).
  *
  * Reference scope note: the reference has no tokenizer; §7.5
  * training-pipeline extension surface.
  */
object WordPiece {

  /** The distinct-word table (word, wc), capped at `maxWordLen`. */
  private def wordTable(docs: DataFrame, textCol: String, maxWordLen: Int): DataFrame =
    docs.select(explode(TextFns.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) <= maxWordLen)
      .groupBy("word").agg(count(lit(1)).as("wc"))

  /** Role-tagged candidate pieces: every substring of every distinct
    * word up to `maxPieceLen` chars, tagged is_cont = starts past
    * position 1, with corpus-frequency-weighted counts per role.
    */
  private def pieceRoleCounts(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(col("word"), col("wc"),
        explode(sequence(lit(1), length(col("word")))).as("s"))
      .select(col("word"), col("wc"), col("s"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
      .filter(col("s") + col("l") - 1 <= length(col("word")))
      .select(expr("substring(word, s, l)").as("piece"),
        (col("s") > 1).as("is_cont"), col("wc"))
      .groupBy("piece", "is_cont").agg(sum(col("wc")).as("cnt"))

  /** Vocabulary = ALL single characters in each observed role (so every
    * word is segmentable) ∪ the top-`vExtra` multi-char (piece, role)
    * entries by (count desc, is_cont asc, piece) — a TakeOrdered.
    */
  private def vocabulary(words: DataFrame, vExtra: Int, maxPieceLen: Int): DataFrame = {
    val pieces = pieceRoleCounts(words, maxPieceLen)
    val chars = pieces.filter(length(col("piece")) === 1)
    val multi = pieces.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("is_cont").asc, col("piece")).limit(vExtra)
    chars.unionByName(multi).select("piece", "is_cont")
  }

  /** Valid greedy edges: j --piece--> k wherever word[j..k) is a
    * vocabulary piece in the role j demands. Vocabulary-sized.
    */
  private def edges(words: DataFrame, vocab: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(col("word"), explode(sequence(lit(1), length(col("word")))).as("s"))
      .select(col("word"), col("s"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
      .filter(col("s") + col("l") - 1 <= length(col("word")))
      .select(col("word"), (col("s") - 1).as("j"), (col("s") + col("l") - 1).as("k"),
        expr("substring(word, s, l)").as("piece"), (col("s") > 1).as("is_cont"))
      .join(vocab, Seq("piece", "is_cont"))
      .select("word", "j", "k")

  /** Per-document WordPiece segmentation: (id, n_words, n_pieces,
    * cuts_sum) — capped token count, total piece count, and the sum of
    * per-word cut-position bitmasks (a digest of every word's exact
    * piece boundaries). Any wrong vocab pick or greedy step anywhere in
    * the corpus changes cuts_sum.
    */
  def wordPieceSegment(docs: DataFrame, idCol: String, textCol: String,
                       vExtra: Int, maxPieceLen: Int, maxWordLen: Int): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 8,
      s"maxPieceLen must be in [1,8], got $maxPieceLen")
    require(maxWordLen >= maxPieceLen && maxWordLen <= 16,
      s"maxWordLen must be in [$maxPieceLen,16] (greedy rounds + cuts-mask bits), got $maxWordLen")
    require(vExtra >= 0 && vExtra <= 100000, s"vExtra out of range: $vExtra")
    val words = Staging.stage(wordTable(docs, textCol, maxWordLen), "wp_words")
    val seg = walk(words.df, vExtra, maxPieceLen)
    val stages = scala.collection.mutable.ArrayBuffer[Staging.Staged](words)
    val out = Staging.stage(
      docs.select(col(idCol).as("id"), explode(TextFns.tokens(col(textCol))).as("word"))
        .join(seg, Seq("word"))
        .groupBy(col("id").as(idCol))
        .agg(count(lit(1)).as("n_words"), sum(col("np")).as("n_pieces"),
          sum(col("cuts")).as("cuts_sum")),
      "wp_out")
    stages.foreach(_.delete())
    out.df
  }

  /** (word, pos, np, cuts) greedy segmentation of every word. */
  private def walk(words: DataFrame, vExtra: Int, maxPieceLen: Int): DataFrame = {
    // The vocabulary is bounded (observed single chars per role + vExtra
    // rows — a TakeOrdered result), so the edge join broadcasts it: the
    // word-substring fan-out never shuffles.
    val eg = edges(words, broadcast(vocabulary(words, vExtra, maxPieceLen)),
      maxPieceLen)

    // The greedy walk is PER-WORD LOCAL: each round's step for a word
    // reads only that word's own edges (max valid k from the current
    // position). So instead of maxWordLen staged join+aggregate rounds
    // (one Spark job + one shuffle each — round-latency-bound, and at
    // scale maxWordLen full passes over the vocabulary table), collapse
    // the edge set to ONE per-word jump table and run the whole walk
    // inside a single codegen-stage expression:
    //   jump[j] = max k over edges starting at j (greedy longest match;
    //             dense in j because every (char, role) is in-vocab),
    //   state fold: pos <- jump[pos], np += 1, cuts += 2^pos' —
    //             exactly the per-round `max(E.k)` aggregate, iterated
    //             maxWordLen times with done-words passing through.
    // One shuffle (the per-word collect) replaces maxWordLen rounds;
    // results are bit-identical because each step is the same integer
    // max/add.
    val jumps = eg.groupBy("word", "j").agg(max(col("k")).as("mk"))
      .groupBy("word")
      .agg(transform(array_sort(collect_list(struct(col("j"), col("mk")))),
        s => s("mk")).as("jump"))
    words.join(jumps, Seq("word"))
      .withColumn("st", expr(s"""aggregate(
          sequence(1, length(word)),
          named_struct('pos', 0, 'np', CAST(0 AS BIGINT), 'cuts', CAST(0 AS BIGINT)),
          (acc, r) -> IF(acc.pos >= length(word), acc,
            named_struct(
              'pos', element_at(jump, acc.pos + 1),
              'np', acc.np + CAST(1 AS BIGINT),
              'cuts', acc.cuts + shiftleft(CAST(1 AS BIGINT),
                element_at(jump, acc.pos + 1)))))"""))
      .select(col("word"), col("st.pos").as("pos"), col("st.np").as("np"),
        col("st.cuts").as("cuts"))
      .filter(col("pos") === length(col("word")))
  }

  /** Dev hook for [[graft.tools.InnerPlans]]: the walk's plan. */
  private[graft] def explainWalk(docs: DataFrame, idCol: String, textCol: String,
                                 vExtra: Int, maxPieceLen: Int, maxWordLen: Int): Unit =
    walk(wordTable(docs, textCol, maxWordLen), vExtra, maxPieceLen)
      .explain("formatted")
}
