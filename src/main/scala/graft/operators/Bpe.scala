package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Byte-pair-encoding VOCABULARY TRAINING as a distributed dataflow —
  * the real tokenizer-training computation (learn the merge table from
  * corpus statistics), not just the q84/q85 apply side.
  *
  * Spark-first decomposition:
  *   - the corpus collapses ONCE to (word, count) — vocabulary-sized,
  *     the only corpus-scale pass;
  *   - each merge round runs entirely on the symbolized vocabulary
  *     table: one windowed pair-count aggregate, ONE scalar argmax to
  *     the driver (the chosen pair — the same bounded per-round scalar
  *     as an iterative convergence check), and one window-based merge
  *     rewrite, re-staged per round for O(1) plan depth;
  *   - merge semantics are the standard leftmost-non-overlapping rule,
  *     expressed relationally (candidate runs → keep odd positions) so
  *     an oracle SQL replay can reproduce it EXACTLY — overlap only
  *     matters for (a,a) pairs inside runs like "aaa".
  *
  * Ties in the argmax break on (count desc, left, right) — a total
  * order, so training is deterministic in any engine.
  *
  * Scale note: production BPE runs ~30k merges; at vocabulary scale
  * each round here costs one shuffle over the symbol table plus one
  * driver scalar, so the dataflow is sound but round-LATENCY-bound.
  * The batching fix is [[trainBpeBatched]]: apply the top-F
  * non-interacting pairs per round — ~F× fewer rounds, same rewrite
  * dataflow, and the 30k-merge tokenizer becomes ~30k/F round trips.
  */
object Bpe {

  /** One learned merge. */
  final case class Merge(step: Int, lhs: String, rhs: String, pair_count: Long)

  /** Train `merges` BPE merges over the corpus' word frequencies.
    * Returns the merge table (step, lhs, rhs, pair_count) — the
    * tokenizer artifact. Stops early when no pair remains.
    */
  def trainBpe(docs: DataFrame, idCol: String, textCol: String, merges: Int): DataFrame = {
    val (learned, fin) = trainCore(docs, textCol, merges)
    fin.delete()
    merge(docs.sparkSession, learned)
  }

  /** Sequential training loop, returning BOTH the learned merge list and
    * the final STAGED symbolized vocabulary table (word, wc, pos, sym) —
    * which IS the BPE encoding of every distinct corpus word after all
    * merges. [[trainBpe]] keeps only the merges; [[encodeBpe]] keeps the
    * symbol table (the per-word encoding cache) and joins it back to the
    * corpus. Caller owns deleting the returned stage.
    */
  /** The symbolized vocabulary table, WITH the successor column: every
    * staged round carries (word, wc, pos, sym, nxt) where nxt =
    * lead(sym) in word order. Persisting nxt costs one extra column per
    * stage and buys two things per round: the pair-count argmax becomes
    * a PLAIN aggregate over the staged table (no window, no sort — the
    * round's first job drops from exchange+sort+agg to agg), and the
    * rewrite no longer needs to recompute the pairing before merging.
    */
  private def symbolized(docs: DataFrame, textCol: String): DataFrame = {
    val words = docs
      .select(explode(TextFns.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wc"))
    val wn = Window.partitionBy("word").orderBy("pos")
    words.select(col("word"), col("wc"),
        posexplode(expr("filter(split(word, ''), s -> s != '')")).as(Seq("pos", "sym")))
      .withColumn("nxt", lead(col("sym"), 1).over(wn))
  }

  /** One leftmost-non-overlapping merge rewrite over the symbolized
    * table, for every position whose (sym, nxt) satisfies `cand` — as a
    * SINGLE window chain over one (word, pos) sort (the old
    * formulation's candidate-run ranking used a second (word, grp)
    * partitioning plus a (word, pos) self-join: 4 more exchanges per
    * round for the same rows):
    *   run_start = latest candidate-run start at or before pos (runs of
    *               consecutive candidate positions — positions are
    *               dense, so adjacency is rank adjacency);
    *   kept      = candidate ∧ (pos − run_start) even — exactly "odd
    *               rank within run" of the ranked form;
    *   drop rows whose predecessor was kept (the absorbed rhs), then
    *   re-rank positions and recompute nxt over the SAME sort.
    */
  private def mergeRewrite(cur: DataFrame, cand: Column): DataFrame = {
    val wn = Window.partitionBy("word").orderBy("pos")
    val running = wn.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cur
      .withColumn("cand", coalesce(cand, lit(false)))
      .withColumn("is_start", col("cand") && !lag(col("cand"), 1, false).over(wn))
      .withColumn("run_start", max(when(col("is_start"), col("pos"))).over(running))
      .withColumn("kept",
        coalesce(col("cand") && (col("pos") - col("run_start")) % 2 === 0, lit(false)))
      .withColumn("prev_kept", lag(col("kept"), 1, false).over(wn))
      .filter(!col("prev_kept"))
      .select(col("word"), col("wc"),
        (row_number().over(wn) - 1).as("pos"),
        when(col("kept"), concat(col("sym"), col("nxt")))
          .otherwise(col("sym")).as("sym"))
      .withColumn("nxt", lead(col("sym"), 1).over(wn))
  }

  /** Dev hook for [[graft.tools.InnerPlans]]: one merge round's plan
    * over a staged symbol table (the plan every training round pays).
    */
  private[graft] def explainRound(docs: DataFrame, textCol: String): Unit = {
    val cur = Staging.stage(symbolized(docs, textCol), "bpe_explain")
    mergeRewrite(cur.df, col("sym") === "e" && col("nxt") === "s")
      .explain("formatted")
    cur.delete()
  }

  private def trainCore(docs: DataFrame, textCol: String,
                        merges: Int): (Seq[Merge], Staging.Staged) = {
    require(merges >= 1 && merges <= 1000, s"merges must be in [1,1000], got $merges")
    var cur = Staging.stage(symbolized(docs, textCol), "bpe_0")
    val learned = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var i = 0
    var done = false
    while (i < merges && !done) {
      val top = cur.df.filter(col("nxt").isNotNull)
        .groupBy("sym", "nxt").agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("sym"), col("nxt"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += Merge(i + 1, a, b, cnt)
        val staged = Staging.stage(
          mergeRewrite(cur.df, col("sym") === a && col("nxt") === b),
          s"bpe_${i + 1}")
        cur.delete()
        cur = staged
        i += 1
      }
    }
    (learned.toSeq, cur)
  }

  /** BPE ENCODE — the tokenizer APPLY side with merges learned by
    * [[trainBpe]] on the same corpus: per document, the concatenation of
    * each word's post-merge symbol sequence, in word order.
    *
    * Spark-first shape (how production tokenization actually scales):
    * the merge loop runs on the DISTINCT-WORD symbol table only
    * (vocabulary-sized rounds — the corpus is never rewritten), and the
    * resulting per-word encoding cache joins back to the corpus token
    * stream in ONE pass. A 100 TB corpus pays one tokenize+join, not
    * `merges` rewrites; the cache is vocabulary-sized and shuffles on
    * the word key (broadcastable when the vocab is small).
    *
    * Output: (id, n_tokens, toks_md5) where toks_md5 digests the
    * U+001F-joined symbol stream — digest instead of the raw array so
    * the result is oracle-hashable; [[BpeSpec]] asserts the underlying
    * sequences. Documents with zero tokens emit no row (same as the
    * words-CTE oracle convention).
    */
  def encodeBpe(docs: DataFrame, idCol: String, textCol: String, merges: Int): DataFrame = {
    val (_, fin) = trainCore(docs, textCol, merges)
    val wordToks = fin.df.groupBy("word")
      .agg(sort_array(collect_list(struct(col("pos"), col("sym")))).as("ps"))
      .select(col("word"),
        transform(col("ps"), p => p("sym")).as("toks"),
        size(col("ps")).as("nt"))
    val docToks = docs.select(col(idCol).as("id"),
      posexplode(TextFns.tokens(col(textCol))).as(Seq("wpos", "word")))
    val out = docToks.join(wordToks, Seq("word"))
      .groupBy("id")
      .agg(sum(col("nt")).cast("long").as("n_tokens"),
        md5(array_join(flatten(transform(
          array_sort(collect_list(struct(col("wpos"), col("toks")))),
          p => p("toks"))), "\u001F")).as("toks_md5"))
    val staged = Staging.stage(out, "bpe_enc")
    fin.delete()
    staged.df
  }

  private def merge(spark: SparkSession, ms: Seq[Merge]): DataFrame = {
    import spark.implicits._
    ms.toDF("step", "lhs", "rhs", "pair_count")
  }

  /** Does candidate pair `c` interact with higher-ranked candidate `h`?
    * Interaction = their symbol sets {lhs, rhs, lhs||rhs} intersect —
    * merging one could then create/destroy occurrences counted by the
    * other, so they can't safely merge in the same round.
    */
  private def conflicts(h: (String, String), c: (String, String)): Boolean = {
    val hs = Set(h._1, h._2, h._1 + h._2)
    val cs = Set(c._1, c._2, c._1 + c._2)
    hs.intersect(cs).nonEmpty
  }

  /** BATCHED BPE training: each of `rounds` rounds counts pairs ONCE,
    * takes the top `f` by (count desc, lhs, rhs), admits every candidate
    * that does not [[conflicts conflict]] with ANY higher-ranked
    * candidate — admitted or not — and applies ALL admitted merges in a
    * single rewrite pass. ~f× fewer round trips than [[trainBpe]]; with
    * `f = 1` it IS trainBpe (rank-1 is always admitted, BpeSpec proves
    * the merge tables equal).
    *
    * Why this exact admission rule (vs the greedy admitted-only
    * variant): checking against all higher-ranked CANDIDATES is a pure
    * anti-join on rank — deterministic, engine-replayable as SQL
    * ([[oracleBatchSql]]), and still guarantees admitted pairs are
    * pairwise non-interacting (for any two admitted pairs the lower-
    * ranked one was checked against the higher-ranked one directly).
    * Slightly conservative — a candidate conflicting only with a
    * REJECTED higher rank also waits a round — which costs round count,
    * never correctness.
    *
    * Why one rewrite pass is safe for symbol-disjoint pairs: a
    * candidate occurrence of (a,b) at position i makes sym(i+1) = b, so
    * a different admitted pair starting at i+1 would need its lhs = b —
    * impossible when pairs share no symbols. Consecutive candidate
    * positions therefore always belong to the SAME pair (the (a,a) run
    * case), and the leftmost-non-overlapping odd-rank rule from the
    * single-pair rewrite applies unchanged.
    *
    * Step numbers follow (round, rank) order, so the merge table is the
    * sequential-application order within each batch.
    */
  def trainBpeBatched(docs: DataFrame, idCol: String, textCol: String,
                      rounds: Int, f: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 1000, s"rounds must be in [1,1000], got $rounds")
    require(f >= 1 && f <= 64, s"f must be in [1,64] (driver collects f rows/round), got $f")
    val spark = docs.sparkSession
    var cur = Staging.stage(symbolized(docs, textCol), "bpeb_0")
    val learned = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var i = 0
    var done = false
    while (i < rounds && !done) {
      val top = cur.df.filter(col("nxt").isNotNull)
        .groupBy("sym", "nxt").agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("sym"), col("nxt"))
        .limit(f).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) done = true
      else {
        val admitted = top.zipWithIndex.collect {
          case ((a, b, cnt), rk)
            if top.take(rk).forall(h => !conflicts((h._1, h._2), (a, b))) => (a, b, cnt)
        }.toSeq
        admitted.foreach { case (a, b, cnt) =>
          learned += Merge(learned.size + 1, a, b, cnt)
        }
        // admitted is a driver-side list of <= f pairs: candidate
        // membership is a literal OR-of-equalities predicate, not a
        // broadcast semi-join (one less join per round; the one-pass
        // multi-pair rewrite is safe because admitted pairs are
        // symbol-disjoint — see the admission-rule doc above)
        val isAdm = admitted.map { case (a, b, _) =>
          col("sym") === a && col("nxt") === b }.reduce(_ || _)
        val staged = Staging.stage(mergeRewrite(cur.df, isAdm), s"bpeb_${i + 1}")
        cur.delete()
        cur = staged
        i += 1
      }
    }
    cur.delete()
    merge(spark, learned.toSeq)
  }

  /** The DuckDB replay of [[trainBpe]] for `merges` rounds, generated as
    * a chained-CTE SQL string (each round = pair/best/cand/keep/rewrite
    * CTEs with the SAME window semantics) — kept next to the trainer so
    * the two formulations evolve together. `wordsCte` must provide
    * words(w) as in ExtQueries.WORDS_SQL.
    */
  /** The DuckDB replay of [[trainBpeBatched]]: per round, the top-`f`
    * pair ranking, the NOT-EXISTS anti-join admission rule (a candidate
    * is admitted iff no higher-ranked candidate's {lhs, rhs, lhs||rhs}
    * intersects its own), and the one-pass multi-pair rewrite. Steps
    * are numbered in (round, rank) order, exactly as the trainer does.
    */
  def oracleBatchSql(rounds: Int, f: Int): String = {
    val base = """
      wrd AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS wc FROM (
          SELECT UNNEST(w) AS word FROM words) GROUP BY 1),
      b0 AS MATERIALIZED (
        SELECT word, wc, i AS pos, cs[CAST(i + 1 AS INTEGER)] AS sym FROM (
          SELECT word, wc, list_filter(string_split(word, ''), x -> x <> '') AS cs
          FROM wrd), UNNEST(range(0, len(cs))) AS t(i))"""
    val roundsSql = (1 to rounds).map { k =>
      val p = s"b${k - 1}"
      s"""
      fl$k AS MATERIALIZED (
        SELECT word, wc, pos, sym,
          lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
        FROM $p),
      pc$k AS MATERIALIZED (
        SELECT a, b, cnt, rk FROM (
          SELECT a, b, cnt, row_number() OVER (ORDER BY cnt DESC, a, b) AS rk
          FROM (
            SELECT sym AS a, nxt AS b, SUM(wc) AS cnt
            FROM fl$k WHERE nxt IS NOT NULL GROUP BY 1, 2))
        WHERE rk <= $f),
      adm$k AS MATERIALIZED (
        SELECT c.a, c.b, c.cnt, c.rk FROM pc$k c
        WHERE NOT EXISTS (
          SELECT 1 FROM pc$k h WHERE h.rk < c.rk AND (
            h.a IN (c.a, c.b, c.a || c.b) OR
            h.b IN (c.a, c.b, c.a || c.b) OR
            h.a || h.b IN (c.a, c.b, c.a || c.b)))),
      cand$k AS MATERIALIZED (
        SELECT fb.word, fb.pos,
          fb.pos - row_number() OVER (PARTITION BY fb.word ORDER BY fb.pos) AS grp
        FROM fl$k fb JOIN adm$k ad ON fb.sym = ad.a AND fb.nxt = ad.b),
      keepb$k AS MATERIALIZED (
        SELECT word, pos FROM (
          SELECT word, pos,
            row_number() OVER (PARTITION BY word, grp ORDER BY pos) AS rn2
          FROM cand$k) WHERE rn2 % 2 = 1),
      mb$k AS MATERIALIZED (
        SELECT fb.word, fb.wc, fb.pos, fb.sym, fb.nxt,
          (k.pos IS NOT NULL) AS kept
        FROM fl$k fb LEFT JOIN keepb$k k ON fb.word = k.word AND fb.pos = k.pos),
      b$k AS MATERIALIZED (
        SELECT word, wc,
          row_number() OVER (PARTITION BY word ORDER BY pos) - 1 AS pos,
          CASE WHEN kept THEN sym || nxt ELSE sym END AS sym
        FROM (
          SELECT *, coalesce(lag(kept) OVER (PARTITION BY word ORDER BY pos), false) AS prev_kept
          FROM mb$k)
        WHERE NOT prev_kept)"""
    }.mkString(",")
    val unioned = (1 to rounds).map(k =>
      s"SELECT $k AS rnd, rk, a, b, cnt FROM adm$k").mkString("\n        UNION ALL ")
    base + "," + roundsSql + s"""
        SELECT CAST(row_number() OVER (ORDER BY rnd, rk) AS INTEGER) AS step,
          a AS lhs, b AS rhs, CAST(cnt AS BIGINT) AS pair_count
        FROM ($unioned)"""
  }

  private val SEQ_BASE = """
      wrd AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS wc FROM (
          SELECT UNNEST(w) AS word FROM words) GROUP BY 1),
      s0 AS MATERIALIZED (
        SELECT word, wc, i AS pos, cs[CAST(i + 1 AS INTEGER)] AS sym FROM (
          SELECT word, wc, list_filter(string_split(word, ''), x -> x <> '') AS cs
          FROM wrd), UNNEST(range(0, len(cs))) AS t(i))"""

  /** The per-round CTE chain shared by [[oracleSql]] and
    * [[oracleEncodeSql]]: fl/best/cand/keep/m/s CTEs per merge round,
    * with the SAME window semantics as the trainer's rewrite.
    */
  private def seqRoundsSql(merges: Int): String =
    (1 to merges).map { k =>
      val p = s"s${k - 1}"
      s"""
      fl$k AS MATERIALIZED (
        SELECT word, wc, pos, sym,
          lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
        FROM $p),
      best$k AS MATERIALIZED (
        SELECT sym AS a, nxt AS b, SUM(wc) AS cnt
        FROM fl$k WHERE nxt IS NOT NULL GROUP BY 1, 2
        ORDER BY cnt DESC, a, b LIMIT 1),
      cand$k AS MATERIALIZED (
        SELECT word, pos,
          pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp
        FROM fl$k, best$k WHERE sym = a AND nxt = b),
      keep$k AS MATERIALIZED (
        SELECT word, pos FROM (
          SELECT word, pos,
            row_number() OVER (PARTITION BY word, grp ORDER BY pos) AS rn2
          FROM cand$k) WHERE rn2 % 2 = 1),
      m$k AS MATERIALIZED (
        SELECT f.word, f.wc, f.pos, f.sym, f.nxt,
          (k.pos IS NOT NULL) AS kept
        FROM fl$k f LEFT JOIN keep$k k ON f.word = k.word AND f.pos = k.pos),
      s$k AS MATERIALIZED (
        SELECT word, wc,
          row_number() OVER (PARTITION BY word ORDER BY pos) - 1 AS pos,
          CASE WHEN kept THEN sym || nxt ELSE sym END AS sym
        FROM (
          SELECT *, coalesce(lag(kept) OVER (PARTITION BY word ORDER BY pos), false) AS prev_kept
          FROM m$k)
        WHERE NOT prev_kept)"""
    }.mkString(",")

  def oracleSql(merges: Int): String = {
    val out = (1 to merges).map(k =>
      s"SELECT CAST($k AS INTEGER) AS step, a AS lhs, b AS rhs, CAST(cnt AS BIGINT) AS pair_count FROM best$k")
      .mkString("\n        UNION ALL ")
    SEQ_BASE + "," + seqRoundsSql(merges) + "\n        " + out
  }

  /** The DuckDB replay of [[encodeBpe]]: the training chain for `merges`
    * rounds (s`merges` IS the per-word encoding), then the per-word
    * symbol strings joined back to the per-doc token stream. `words`
    * must provide (doc_id, w) as in ExtQueries.WORDS_SQL.
    */
  def oracleEncodeSql(merges: Int): String =
    SEQ_BASE + "," + seqRoundsSql(merges) + s""",
      wt AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS nt,
          string_agg(sym, chr(31) ORDER BY pos) AS wtok
        FROM s$merges GROUP BY 1),
      dt AS MATERIALIZED (
        SELECT doc_id, i AS wpos, w[CAST(i + 1 AS INTEGER)] AS word
        FROM words, UNNEST(range(0, len(w))) AS t(i)
        WHERE len(w) > 0)
      SELECT dt.doc_id AS id, CAST(SUM(wt.nt) AS BIGINT) AS n_tokens,
        md5(string_agg(wt.wtok, chr(31) ORDER BY dt.wpos)) AS toks_md5
      FROM dt JOIN wt ON dt.word = wt.word
      GROUP BY 1"""
}
