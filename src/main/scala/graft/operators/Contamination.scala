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

  /** FUZZY decontamination: corpus documents that are NEAR-duplicates of
    * a benchmark item — the hygiene pass [[ngramOverlap]]'s exact probe
    * cannot do (a paraphrased or truncated eval item shares few exact
    * n-grams but most of its shingle set). Cross-corpus MinHash-LSH:
    * band signatures on both sides ([[Dedup.minhashBands]] — the same
    * portable md5 construction as q32), candidates = (corpus, bench)
    * pairs agreeing on ≥1 band, then EXACT-Jaccard verification at
    * integer threshold `num/den` over the full shingle sets.
    *
    * Output: one row per verified (id, bench_id) pair with the overlap
    * evidence — (id, bench_id, shared, n_doc, n_bench, jaccard).
    * Callers drop every distinct `id`.
    *
    * Scale shape: the bench side is tiny by contract (eval suites), so
    * its bands AND its postings broadcast — the corpus side computes
    * signatures in one aggregate and never self-joins; candidates ≈
    * corpus docs colliding with a bench band, and the verify join is
    * semi-join-shrunk to those docs first. LSH recall < 1 by design
    * (the banding curve); both engines replay the identical bands, so
    * the result is still deterministic.
    */
  def fuzzyOverlap(corpus: DataFrame, bench: DataFrame, idCol: String,
                   textCol: String, n: Int, k: Int, rowsPerBand: Int,
                   num: Int, den: Int): DataFrame = {
    require(k % rowsPerBand == 0,
      s"k ($k) must be a multiple of rowsPerBand ($rowsPerBand)")
    require(num >= 1 && den >= 1 && num <= den,
      s"threshold must be a fraction in (0,1]: got $num/$den")
    val csh = Dedup.staged(Dedup.shingleSet(corpus, idCol, textCol, n), "fuzzy_corpus_sh")
    val bsh = Dedup.shingleSet(bench, idCol, textCol, n)
    val cBands = Dedup.minhashBands(csh, k, rowsPerBand)
    val bBands = Dedup.minhashBands(bsh, k, rowsPerBand)
      .select(col("id").as("bench_id"), col("band"), col("sig"))
    val cand = cBands.join(broadcast(bBands), Seq("band", "sig"))
      .select(col("id"), col("bench_id")).distinct()
    val candDocs = cand.select("id").distinct()
    val shc = csh.join(broadcast(candDocs), Seq("id"), "left_semi")
    val shared = shc
      .join(broadcast(bsh.select(col("id").as("bench_id"), col("sh"))), Seq("sh"))
      .groupBy("id", "bench_id").agg(count(lit(1)).as("shared"))
      .join(cand, Seq("id", "bench_id"), "left_semi")
    val cSizes = csh.groupBy("id").agg(count(lit(1)).as("n_doc"))
    val bSizes = bsh.groupBy("id").agg(count(lit(1)).as("n_bench"))
      .select(col("id").as("bench_id"), col("n_bench"))
    shared
      .join(cSizes, Seq("id"))
      .join(broadcast(bSizes), Seq("bench_id"))
      .filter(col("shared") * den >= (col("n_doc") + col("n_bench") - col("shared")) * num)
      .select(col("id"), col("bench_id"), col("shared"), col("n_doc"), col("n_bench"),
        (col("shared").cast("double")
          / (col("n_doc") + col("n_bench") - col("shared"))).as("jaccard"))
  }

  /** SEMANTIC decontamination — the third member of the family (exact
    * n-gram [[ngramOverlap]], lexical-fuzzy [[fuzzyOverlap]], and this):
    * corpus documents whose EMBEDDING is near a benchmark item's, which
    * catches translations/rewrites that share almost no surface text.
    *
    * Same cell confinement as [[SimilaritySearch.semanticDedup]]: both
    * sides assign to IVF cells (broadcast centroids, map-side argmax
    * collapse before any exchange), and pairwise cosine runs only
    * between a corpus vector's ONE cell and the bench items probing it.
    * The bench side probes its `nProbe` nearest cells (the recall knob,
    * on the TINY side only — the corpus stays single-cell, so a pair
    * can arise from at most one probe). Bench cells broadcast into the
    * pair join; the corpus never self-joins and never shuffles beyond
    * its one assignment aggregate.
    *
    * Output: (id, bench_id, sim) for every pair at `simThreshold` or
    * above — an exact leaked eval item surfaces at sim ≈ 1.0 (within
    * one ulp: the fixed-point dot over √n2·√n2). The
    * threshold compares the fixed-point-derived double both engines
    * compute, so the decision is engine-exact.
    */
  def semanticOverlap(corpus: DataFrame, bench: DataFrame, idCol: String,
                      vecCol: String, centroids: DataFrame, cidCol: String,
                      cvecCol: String, simThreshold: Double, nProbe: Int): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    import graft.functions.VectorFns
    val cent = broadcast(centroids.select(col(cidCol).as("cid"),
      col(cvecCol).as("cvec"), VectorFns.norm2Fixed9(col(cvecCol)).as("cn2")))
    def scored(df: DataFrame, p: String): DataFrame =
      df.select(col(idCol).as(s"${p}id"), col(vecCol).as(s"${p}vec"),
        VectorFns.norm2Fixed9(col(vecCol)).as(s"${p}n2"))
        .join(cent)
        .select(col(s"${p}id"), col(s"${p}vec"), col(s"${p}n2"), col("cid"),
          VectorFns.cosineFrom(VectorFns.dotFixed9(col(s"${p}vec"), col("cvec")),
            col(s"${p}n2"), col("cn2")).as("csim"))
    val corpusCells = scored(corpus, "n")
      .groupBy("nid")
      .agg(max_by(struct(col("cid"), col("nvec"), col("nn2")),
        struct(col("csim"), -col("cid"))).as("b"))
      .select(col("nid"), col("b.cid").as("cid"),
        col("b.nvec").as("nvec"), col("b.nn2").as("nn2"))
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("bid").orderBy(col("csim").desc, col("cid"))
    val benchCells = scored(bench, "b")
      .withColumn("rn", row_number().over(wProbe)).filter(col("rn") <= nProbe)
      .select(col("bid"), col("cid"), col("bvec"), col("bn2"))
    corpusCells.join(broadcast(benchCells), Seq("cid"))
      .select(col("nid"), col("bid"),
        VectorFns.cosineFrom(VectorFns.dotFixed9(col("nvec"), col("bvec")),
          col("nn2"), col("bn2")).as("sim"))
      .filter(col("sim") >= simThreshold)
      .select(col("nid").as(idCol), col("bid").as("bench_id"), col("sim"))
  }
}
