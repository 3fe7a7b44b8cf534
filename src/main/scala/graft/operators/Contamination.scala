package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share word
  * n-grams with an evaluation/benchmark set — the standard pre-training
  * hygiene pass (a training document containing an eval item's n-grams
  * leaks the benchmark into the model).
  */
object Contamination {

  /** Per-corpus-document overlap with the benchmark n-gram set.
    *
    * One row per corpus document with at least `n` words:
    * `(id, n_shingles, n_hits, contaminated)` where `n_hits` counts the
    * document's DISTINCT n-grams that occur anywhere in the benchmark
    * set and `contaminated` is `n_hits > 0`. Callers escalate from the
    * boolean flag to an overlap-ratio threshold (`n_hits / n_shingles`)
    * when partial-overlap tolerance is wanted.
    *
    * Scale shape: the benchmark set is tiny next to a 100 TB corpus
    * (eval suites are ~1e5–1e6 n-grams), so its distinct shingle set
    * BROADCASTS and the corpus side never shuffles for the probe: the
    * plan is scan → explode → broadcast-hash-join → partial aggregate,
    * all linear in corpus bytes. The per-doc size and hit aggregates
    * both combine map-side on the doc id. Nothing is quadratic — there
    * is no corpus self-join anywhere.
    */
  def ngramOverlap(corpus: DataFrame, bench: DataFrame, idCol: String,
                   textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    // (id, sh) posting rows; shared subtree feeds sizes + hits in ONE
    // job, and it ends in shingleSet's distinct (an exchange), so
    // runtime exchange reuse computes it once — no staging write.
    val cs = Dedup.shingleSet(corpus, idCol, textCol, n)
    val bs = Dedup.shingleSet(bench, idCol, textCol, n).select("sh").distinct()
    val sizes = cs.groupBy("id").agg(count(lit(1)).as("n_shingles"))
    val hits = cs.join(broadcast(bs), Seq("sh"))
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
    sizes.join(hits, Seq("id"), "left")
      .na.fill(0L, Seq("n_hits"))
      .select(col("id"), col("n_shingles"), col("n_hits"),
        (col("n_hits") > 0).as("contaminated"))
  }
}
