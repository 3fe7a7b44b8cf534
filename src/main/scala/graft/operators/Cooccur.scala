package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Co-occurrence statistics — the GloVe / word2vec-SGNS preprocessing
  * layer (Mikolov 2013, Pennington 2014): skip-gram pair extraction
  * within a token window and PMI-scored collocations. The statistics —
  * not the embedding gradient loop — are the data-engine part of
  * embedding training: at 100 TB the co-occurrence counting is the job,
  * and its output (vocab²-bounded, heavily pruned) feeds any trainer.
  */
object Cooccur {

  /** Unordered skip-gram co-occurrence pairs: every token pair at
    * distance ≤ `window` inside a document, normalized to (a ≤ b)
    * lexicographic order so the count matrix is symmetric. Built
    * ROW-LOCALLY from the token array with codegen'd HOFs (each
    * position pairs with its next ≤ `window` successors — no positional
    * self-join, no shuffle before the count): output is one grouped
    * count whose size is bounded by distinct pairs, not token volume.
    */
  def skipGramPairs(docs: DataFrame, idCol: String, textCol: String,
                    window: Int): DataFrame = {
    require(window >= 1 && window <= 16, s"window must be in [1,16], got $window")
    // tokens materialize ONCE before the HOFs (interpreted lambdas
    // re-evaluate inline arguments per element — the TextFns trap)
    val pairs = flatten(transform(col("__w"),
      (x, i) => transform(slice(col("__w"), i + lit(2), lit(window)),
        y => struct(least(x, y).as("a"), greatest(x, y).as("b")))))
    docs.select(TextFns.tokens(col(textCol)).as("__w"))
      .select(explode(pairs).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
  }

  /** PMI-ranked collocations over [[skipGramPairs]] counts: for every
    * surviving pair,
    *
    *   pmi_mb = mlog2(c_ab) + 2·mlog2(N) − mlog2(P) − mlog2(c_a) − mlog2(c_b)
    *
    * (P = total pair occurrences, N = total token occurrences, c_x =
    * unigram occurrence counts; exact MILLI-BIT integer log2 — the
    * BM25/KN/DSIR discipline — so the ranking is engine-exact), keeping
    * each word's top `k` partners. `minCount` prunes hapax pairs BEFORE
    * any scoring — the standard vocabulary cut that also bounds the
    * pair table.
    *
    * Scale shape: one corpus scan for unigrams, one for pairs (both
    * map-side-combining counts); scoring and the per-word top-k window
    * run on the PRUNED pair table (vocab-bounded metadata, not corpus).
    */
  def pmiCollocations(docs: DataFrame, idCol: String, textCol: String,
                      window: Int, minCount: Long, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pairs = skipGramPairs(docs, idCol, textCol, window)
      .filter(col("c_ab") >= minCount)
    val uni = docs.select(explode(TextFns.tokens(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c_t"))
    val totals = pairs.agg(sum("c_ab").as("p_tot")).crossJoin(
      uni.agg(sum("c_t").as("n_tot")))
    val mlog2 = (c: String) => expr(CorpusText.mlog2Sql(c))
    val scored = pairs
      .join(uni.select(col("t").as("a"), col("c_t").as("c_a")), Seq("a"))
      .join(uni.select(col("t").as("b"), col("c_t").as("c_b")), Seq("b"))
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("c_ab"),
        (mlog2("c_ab") + lit(2) * mlog2("n_tot") - mlog2("p_tot")
          - mlog2("c_a") - mlog2("c_b")).as("pmi_mb"))
    // symmetrize (the count matrix is unordered) so EVERY word ranks
    // its partners, then take the per-word top-k: the window runs over
    // the pruned pair table (bounded by distinct partners per word),
    // never the corpus
    val sym = scored.unionByName(scored.filter(col("a") =!= col("b"))
      .select(col("b").as("a"), col("a").as("b"), col("c_ab"), col("pmi_mb")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("a").orderBy(col("pmi_mb").desc, col("b"))
    sym.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("a"), col("b"), col("c_ab"), col("pmi_mb"),
        col("rank").cast("int").as("rank"))
  }
}
