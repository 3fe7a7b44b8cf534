package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Approximate-nearest-neighbor search over an `ArrayType(FloatType)`
  * embedding column.
  *
  * - [[bruteForceTopK]] is the exact baseline: queries × corpus, dot
  *   products fully codegen'd (zip_with/aggregate — no UDF), ranked with
  *   one window. Cost Q·N·d; at 100 TB you bound Q per job and let the
  *   corpus side stream through executors — no state on the driver.
  * - [[bucketedTopK]] is the scale path: a deterministic sign-bit LSH
  *   bucket (2^bits cells) computed on BOTH sides; candidates are only
  *   same-bucket pairs, cutting cost by ~2^bits at a small recall loss.
  *   The bucket column is also the natural physical partitioning for a
  *   pre-bucketed corpus table, making the probe a co-located join.
  *
  * Similarities accumulate in exact fixed-point integers (see [[VectorFns]]) so
  * results are reproducible across engines and partitionings.
  */
object SimilaritySearch {

  private def withNorm(df: DataFrame, idCol: String, vecCol: String, prefix: String): DataFrame =
    df.select(col(idCol).as(s"${prefix}id"), col(vecCol).as(s"${prefix}vec"),
      VectorFns.norm2Fixed9(col(vecCol)).as(s"${prefix}n2"))

  /** Exact cosine top-k: every query against the whole corpus. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = withNorm(queries, idCol, vecCol, "q")
    val c = withNorm(corpus, idCol, vecCol, "n")
    val sims = q.join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        VectorFns.cosineFrom(
          VectorFns.dotFixed9(col("qvec"), col("nvec")), col("qn2"), col("nn2")).as("sim_raw"))
    rank(sims, k)
  }

  /** Sign-bucket LSH top-k: only same-bucket candidates are scored. */
  def bucketedTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                   vecCol: String, k: Int, bits: Int): DataFrame = {
    val q = withNorm(queries, idCol, vecCol, "q")
      .withColumn("bucket", VectorFns.signBucket(col("qvec"), bits))
    val c = withNorm(corpus, idCol, vecCol, "n")
      .withColumn("bucket", VectorFns.signBucket(col("nvec"), bits))
    val sims = q.join(c, Seq("bucket")).filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        VectorFns.cosineFrom(
          VectorFns.dotFixed9(col("qvec"), col("nvec")), col("qn2"), col("nn2")).as("sim_raw"))
    rank(sims, k)
  }

  /** Multi-probe sign-bucket LSH top-k: each query probes its own bucket
    * PLUS every bucket at Hamming distance 1 (flip one of the `bits`
    * sign-planes) — the standard recall fix for bucketed LSH, recovering
    * neighbors that fall just across one hyperplane. Cost grows by the
    * probe count (1 + bits) on the QUERY side only — the corpus stays in
    * exactly one bucket, so a pre-bucketed/partitioned corpus table is
    * still probed co-located, and a (query, candidate) pair can arise
    * from at most one probe (no dedup pass needed).
    */
  def bucketedTopKMultiProbe(queries: DataFrame, corpus: DataFrame, idCol: String,
                             vecCol: String, k: Int, bits: Int): DataFrame = {
    val probes = array((lit(0) +: (0 until bits).map(b => lit(1 << b))): _*)
    val q = withNorm(queries, idCol, vecCol, "q")
      .withColumn("probe", explode(probes))
      .withColumn("bucket",
        VectorFns.signBucket(col("qvec"), bits).bitwiseXOR(col("probe")))
      .drop("probe")
    val c = withNorm(corpus, idCol, vecCol, "n")
      .withColumn("bucket", VectorFns.signBucket(col("nvec"), bits))
    val sims = q.join(c, Seq("bucket")).filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        VectorFns.cosineFrom(
          VectorFns.dotFixed9(col("qvec"), col("nvec")), col("qn2"), col("nn2")).as("sim_raw"))
    rank(sims, k)
  }

  /** JL-PROJECTED sign-bucket LSH top-k: the [[bucketedTopK]] probe with
    * the bucket computed from `bits` Johnson-Lindenstrauss ±1
    * projections ([[VectorFns.jlCoord]]) instead of the first `bits`
    * raw axes. Axis-aligned planes hash badly when leading dimensions
    * are correlated or low-variance (real embedding models concentrate
    * energy unevenly); Rademacher planes mix ALL dimensions, so bucket
    * occupancy stays balanced on any embedding geometry — same
    * candidate-cut contract (~2^bits), same co-located join shape, and
    * the projection itself is a row-local map on the scan.
    */
  def jlBucketedTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int, bits: Int, dIn: Int): DataFrame = {
    def jlBucket(v: org.apache.spark.sql.Column) =
      (0 until bits).map(j =>
        when(VectorFns.jlCoord(v, dIn, j) > 0, 1 << j).otherwise(0)).reduce(_ + _)
    val q = withNorm(queries, idCol, vecCol, "q")
      .withColumn("bucket", jlBucket(col("qvec")))
    val c = withNorm(corpus, idCol, vecCol, "n")
      .withColumn("bucket", jlBucket(col("nvec")))
    val sims = q.join(c, Seq("bucket")).filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        VectorFns.cosineFrom(
          VectorFns.dotFixed9(col("qvec"), col("nvec")), col("qn2"), col("nn2")).as("sim_raw"))
    rank(sims, k)
  }

  /** IVF (inverted-file) top-k: the data-DEPENDENT scale path, dual to
    * the hash-based buckets. `centroids` come from the caller (trained
    * offline — k-means or a coreset; at 100 TB centroid training is its
    * own job, never inlined into the probe). The operator:
    *
    *   1. assigns every corpus vector to its nearest centroid — a
    *      broadcast of the (tiny) centroid set against the streaming
    *      corpus, one row-local argmax, emitted as the `cid` cell key;
    *      the cell key is the natural physical partitioning of a
    *      pre-assigned corpus table,
    *   2. probes each query's `nProbe` nearest cells (the recall knob),
    *   3. scores only candidates in probed cells — cost ≈ Q·N·nProbe/C.
    *
    * Ties break on centroid id, so assignment is total and the result
    * engine-reproducible (fixed-point cosine throughout).
    */
  private def ivfScored(side: DataFrame, centroids: DataFrame, vecCol: String,
                        cidCol: String, p: String): DataFrame = {
    val cent = centroids.select(col(cidCol).as("cid"), col(vecCol).as("cvec"),
      VectorFns.norm2Fixed9(col(vecCol)).as("cn2"))
    side.join(broadcast(cent))
      .select(col(s"${p}id"), col(s"${p}vec"), col(s"${p}n2"), col("cid"),
        VectorFns.cosineFrom(VectorFns.dotFixed9(col(s"${p}vec"), col("cvec")),
          col(s"${p}n2"), col("cn2")).as("csim"))
  }

  /** IVF INDEX BUILD — per-vector cell assignment (nid, cid, nvec, nn2):
    * argmax as a map-side-combinable max_by, so the C-way broadcast
    * fan-out collapses back to one row per vector BEFORE any exchange
    * (a window formulation would shuffle C× the corpus just to keep
    * rn=1). Tie order (csim, -cid) is total. Assignment is PER-VECTOR
    * (centroids fixed), so the index maintains INCREMENTALLY: a new
    * batch assigns independently and unions onto the stored index —
    * no rebuild, no touch of existing rows (q173 proves
    * append ≡ full rebuild under the oracle).
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame, idCol: String,
                vecCol: String, cidCol: String): DataFrame =
    ivfScored(withNorm(corpus, idCol, vecCol, "n"), centroids, vecCol, cidCol, "n")
      .groupBy("nid")
      .agg(max_by(struct(col("cid"), col("nvec"), col("nn2")),
        struct(col("csim"), -col("cid"))).as("best"))
      .select(col("nid"), col("best.cid").as("cid"),
        col("best.nvec").as("nvec"), col("best.nn2").as("nn2"))

  /** Query-side probe table (qid, qvec, qn2, cid): each query's
    * top-nProbe cells. The window stays on the query side only — small
    * by contract.
    */
  private def ivfProbes(queries: DataFrame, centroids: DataFrame, idCol: String,
                        vecCol: String, cidCol: String, nProbe: Int): DataFrame = {
    val wProbe = Window.partitionBy("qid").orderBy(col("csim").desc, col("cid"))
    ivfScored(withNorm(queries, idCol, vecCol, "q"), centroids, vecCol, cidCol, "q")
      .withColumn("rn", row_number().over(wProbe)).filter(col("rn") <= nProbe)
      .select(col("qid"), col("qvec"), col("qn2"), col("cid"))
  }

  /** IVF probe against a PREBUILT index (the [[ivfAssign]] shape) —
    * the serving-time half: query probes its top-nProbe cells, scores
    * only same-cell candidates.
    */
  def ivfTopKIndexed(queries: DataFrame, index: DataFrame, centroids: DataFrame,
                     idCol: String, vecCol: String, cidCol: String,
                     k: Int, nProbe: Int): DataFrame = {
    val probes = ivfProbes(queries, centroids, idCol, vecCol, cidCol, nProbe)
    val sims = probes.join(index, Seq("cid")).filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        VectorFns.cosineFrom(
          VectorFns.dotFixed9(col("qvec"), col("nvec")), col("qn2"), col("nn2")).as("sim_raw"))
    rank(sims, k)
  }

  /** IVF-SQ8 composed ANN — FAISS `IVFx,SQ8`, the sibling of
    * [[ivfPqTopK]]: cells cut candidates ~C/nProbe×, SQ8 cuts
    * bytes/candidate 4× at near-exact fidelity (vs PQ's 32× at real
    * recall loss) — the middle point of the compression/recall
    * trade-off. Candidates score by exact micro-unit squared-L2
    * against the RECONSTRUCTED byte codes (the [[sq8TopK]]
    * arithmetic), ranked ascending.
    */
  def ivfSq8TopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
                 stats: DataFrame, idCol: String, vecCol: String, cidCol: String,
                 k: Int, nProbe: Int): DataFrame = {
    val cells = ivfAssign(corpus, centroids, idCol, vecCol, cidCol)
      .select(col("nid"), col("cid"))
    val recon = sq8Recon(sq8Encode(corpus, idCol, vecCol, stats), idCol, stats)
    val q = queries.select(col(idCol).as("qid"),
      transform(col(vecCol),
        x => floor(x.cast("double") * lit(1e9)).cast("long")).as("qfx"))
    val probes = ivfProbes(queries, centroids, idCol, vecCol, cidCol, nProbe)
      .select(col("qid"), col("cid"))
    val du = zip_with(col("qfx"), col("rfx"),
      (a, b) => floor(abs(a - b) / lit(1000.0)).cast("long"))
    val d2 = aggregate(du, lit(0L), (acc, x) => acc + x * x)
    val sims = probes.join(cells, Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .join(recon, Seq("nid")).join(q, Seq("qid"))
      .select(col("qid"), col("nid"), d2.as("d2"))
    val w = Window.partitionBy("qid").orderBy(col("d2"), col("nid"))
    sims.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("d2"), col("rank"))
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              idCol: String, vecCol: String, cidCol: String,
              k: Int, nProbe: Int): DataFrame =
    ivfTopKIndexed(queries,
      ivfAssign(corpus, centroids, idCol, vecCol, cidCol),
      centroids, idCol, vecCol, cidCol, k, nProbe)

  /** ATTRIBUTE-FILTERED ANN — the pgvector/Qdrant/Weaviate "filtered
    * vector search" shape: top-k nearest among ONLY the corpus vectors
    * an attribute predicate keeps. `matching` carries the surviving ids
    * (computed from any metadata frame by the caller); `index` is the
    * prebuilt [[ivfAssign]] table. Production planners gate the
    * strategy on predicate selectivity, and so does this operator:
    *
    *   - ≤ `maxExactRows` survivors → EXACT scoring of the survivors:
    *     a highly selective filter makes exact search CHEAPER than
    *     probing AND recall-perfect (probed cells would hold few or
    *     none of the scattered survivors — the classic filtered-ANN
    *     recall collapse);
    *   - above it → IVF cell probe with the filter pushed into the
    *     candidate set BEFORE any scoring (candidates = probed cells ∩
    *     matching — the "pre-filtered post-filter" every vector store
    *     converges on).
    *
    * The gate is one count over the semi-joined index — metadata-cheap
    * next to scoring — and deterministic for a given input, so the
    * composite replays exactly. The index scans twice (gate + chosen
    * branch); at scale both are column-pruned id/cell reads.
    */
  def filteredTopK(queries: DataFrame, index: DataFrame, centroids: DataFrame,
                   matching: DataFrame, idCol: String, vecCol: String,
                   cidCol: String, k: Int, nProbe: Int,
                   maxExactRows: Long = 10000L): DataFrame = {
    val ids = matching.select(col(idCol).as("nid")).distinct()
    val live = index.join(ids, Seq("nid"), "left_semi")
    if (live.count() <= maxExactRows) {
      val q = withNorm(queries, idCol, vecCol, "q")
      val sims = q.join(live, col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          VectorFns.cosineFrom(VectorFns.dotFixed9(col("qvec"), col("nvec")),
            col("qn2"), col("nn2")).as("sim_raw"))
      rank(sims, k)
    } else
      ivfTopKIndexed(queries, live, centroids, idCol, vecCol, cidCol, k, nProbe)
  }

  /** Aggregator-based variant of the exact search: replaces the window
    * sort with the bounded-heap [[graft.expr.TopKAggregator]] — each
    * partial buffer carries at most k entries and combines map-side, so
    * a query with a billion candidates never sorts them. Same results as
    * [[bruteForceTopK]] (same total order).
    */
  def bruteForceTopKAgg(queries: DataFrame, corpus: DataFrame, idCol: String,
                        vecCol: String, k: Int): DataFrame = {
    import graft.expr.{Scored, TopKAggregator}
    val q = withNorm(queries, idCol, vecCol, "q")
    val c = withNorm(corpus, idCol, vecCol, "n")
    val sims = q.join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        VectorFns.cosineFrom(
          VectorFns.dotFixed9(col("qvec"), col("nvec")), col("qn2"), col("nn2")).as("sim_raw"))
    val spark = sims.sparkSession
    import spark.implicits._
    val agg = new TopKAggregator(k).toColumn
    sims.select(col("qid"), col("sim_raw").as("score"), col("nid").as("id"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => Scored(t._2, t._3))
      .agg(agg.name("topk"))
      .flatMap { case (qid, top) =>
        top.iterator.zipWithIndex.map { case (s, i) => (qid, s.id, s.score, i + 1) }
      }
      .toDF("qid", "nid", "sim", "rank")
  }

  /** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023): assign
    * every vector to its nearest centroid (the IVF cells — pairwise
    * work is confined WITHIN cells, the paper's whole point), connect
    * within-cell pairs whose cosine exceeds `simThreshold`, and collapse
    * each connected near-dup group to its minimum-id representative.
    * Output: one row per vector — (id, cid, rep, kept) with
    * `kept = (rep == id)`; downstream keeps the `kept` rows.
    *
    * Scale: candidate volume is Σ cell² (the cells bound the quadratic
    * term exactly like LSH buckets in [[bucketedTopK]]); the grouping is
    * [[Graph.connectedComponents]] over the near-dup pairs (clique-like
    * → 2-3 staged rounds). The threshold compares the same
    * fixed-point-derived double both engines compute, so the decision
    * is engine-exact.
    */
  def semanticDedup(points: DataFrame, idCol: String, vecCol: String,
                    centroids: DataFrame, cidCol: String, cvecCol: String,
                    simThreshold: Double): DataFrame = {
    val cent = broadcast(centroids.select(col(cidCol).as("cid"),
      col(cvecCol).as("cvec"), VectorFns.norm2Fixed9(col(cvecCol)).as("cn2")))
    val pts = points.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
      VectorFns.norm2Fixed9(col(vecCol)).as("nn2"))
    val cells = pts.join(cent)
      .select(col("nid"), col("nvec"), col("nn2"), col("cid"),
        VectorFns.cosineFrom(VectorFns.dotFixed9(col("nvec"), col("cvec")),
          col("nn2"), col("cn2")).as("csim"))
      .groupBy("nid")
      .agg(max_by(struct(col("cid"), col("nvec"), col("nn2")),
        struct(col("csim"), -col("cid"))).as("best"))
      .select(col("nid"), col("best.cid").as("cid"),
        col("best.nvec").as("nvec"), col("best.nn2").as("nn2"))
    val a = cells.select(col("cid"), col("nid").as("ida"),
      col("nvec").as("va"), col("nn2").as("n2a"))
    val b = cells.select(col("cid"), col("nid").as("idb"),
      col("nvec").as("vb"), col("nn2").as("n2b"))
    val pairs = a.join(b, Seq("cid")).filter(col("ida") < col("idb"))
      .filter(VectorFns.cosineFrom(VectorFns.dotFixed9(col("va"), col("vb")),
        col("n2a"), col("n2b")) >= simThreshold)
      .select(col("ida"), col("idb"))
    val reps = Graph.connectedComponents(pairs, "ida", "idb")
    cells.select(col("nid"), col("cid"))
      .join(reps.withColumnRenamed("id", "nid"), Seq("nid"), "left")
      .select(col("nid").as(idCol), col("cid"),
        coalesce(col("cluster"), col("nid")).as("rep"))
      .withColumn("kept", col("rep") === col(idCol))
  }

  /** Recall@k of an approximate result against the exact result, both in
    * this object's (qid, nid, sim, rank) shape: per query, the fraction
    * of the exact top-k the approximate run also returned, macro-averaged
    * over queries. One row: (n_queries, recall). The quality dimension
    * the correctness hashes cannot see — a bucketed ANN can be perfectly
    * deterministic (hash-green) and still miss true neighbors; this is
    * the measurement for that, driven by `graft.tools.Recall` per round.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val hits = exact.select(col("qid"), col("nid"))
      .join(approx.select(col("qid"), col("nid")), Seq("qid", "nid"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("n_hits"))
    exact.groupBy("qid").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("qid"), "left").na.fill(0L, Seq("n_hits"))
      .agg(count(lit(1)).as("n_queries"),
        avg(col("n_hits").cast("double") / col("n_exact")).as("recall"))
  }

  /** Deterministic product-quantization codebook from the `ksub`
    * smallest-id corpus vectors: subspace `ms` of seed `i` becomes
    * sub-centroid (ms, code=i). The init-only quantizer — production
    * trains each subspace's codebook with [[Clustering]] k-means (its
    * own offline job at 100 TB); this seed path is the deterministic,
    * oracle-replayable stand-in, exactly like q50's IVF centroids.
    * Output: (ms, code, cvec) with `cvec` the `subDim`-wide slice.
    */
  def pqSeedCodebook(corpus: DataFrame, idCol: String, vecCol: String,
                     m: Int, subDim: Int, ksub: Int): DataFrame = {
    val seeds = corpus.orderBy(col(idCol)).limit(ksub)
      .select(col(idCol).as("sid"), col(vecCol).as("svec"))
      .withColumn("code",
        (row_number().over(Window.orderBy(col("sid"))) - 1).cast("int"))
    seeds.withColumn("ms", explode(sequence(lit(0), lit(m - 1))))
      .select(col("ms"), col("code"),
        expr(s"slice(svec, ms * $subDim + 1, $subDim)").as("cvec"))
  }

  /** Per-(id, subspace) fixed-point squared-L2 distance to every
    * sub-centroid: (`p`id, ms, code, d) with d = |sv|² + |cv|² − 2·sv·cv
    * in the 1e9 fixed-point domain — exact integers, engine-identical.
    * This one table is both the ENCODE argmin input (corpus side) and
    * the ADC lookup table (query side).
    */
  private def pqDists(side: DataFrame, idCol: String, vecCol: String,
                      codebook: DataFrame, m: Int, subDim: Int, p: String): DataFrame = {
    val cb = broadcast(codebook.select(col("ms"), col("code"), col("cvec"),
      VectorFns.norm2Fixed9(col("cvec")).as("cn2")))
    side.select(col(idCol).as(s"${p}id"), col(vecCol).as("v"))
      .withColumn("ms", explode(sequence(lit(0), lit(m - 1))))
      .withColumn("sv", expr(s"slice(v, ms * $subDim + 1, $subDim)"))
      .withColumn("sn2", VectorFns.norm2Fixed9(col("sv")))
      .join(cb, Seq("ms"))
      .select(col(s"${p}id"), col("ms"), col("code"),
        (col("sn2") + col("cn2")
          - lit(2L) * VectorFns.dotFixed9(col("sv"), col("cvec"))).as("d"))
  }

  /** Product-quantization ENCODE: each vector compresses to `m` codes
    * (argmin sub-centroid per subspace, ties → smallest code). Output
    * (id, codes: array<int>) — the stored ANN artifact. THIS is the PQ
    * scale story: at d=64 float32 → m=8 byte codes the corpus shrinks
    * ~32×, so the candidate scan runs against a table that fits in
    * memory at sizes where raw vectors cannot. The fan-out
    * (m·ksub rows per vector) collapses back to one row per vector
    * before any exchange — broadcast codebook, map-side min_by, same
    * discipline as [[ivfTopK]]'s assignment.
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               codebook: DataFrame, m: Int, subDim: Int): DataFrame =
    pqDists(corpus, idCol, vecCol, codebook, m, subDim, "n")
      .groupBy("nid", "ms")
      .agg(min_by(col("code"), struct(col("d"), col("code"))).as("code"))
      .groupBy("nid")
      .agg(transform(array_sort(collect_list(struct(col("ms"), col("code")))),
        p => p("code")).as("codes"))
      .select(col("nid").as(idCol), col("codes"))

  /** Per-subspace L2 Lloyd training of the PQ codebook — the quality
    * lever over [[pqSeedCodebook]] (measured in `tools.Recall`). ALL
    * subspaces train in ONE dataflow per iteration: sub-vectors explode
    * once (staged — reused every round), assignment is a broadcast-join
    * + map-side min_by per (point, subspace), and the update is a
    * per-(subspace, code, dim) mean in the fixed-point domain (exact
    * long sums — deterministic under any partitioning, same discipline
    * as [[Clustering.kmeansStep]]). Shuffle per iteration is
    * m·ksub·subDim partial rows, independent of corpus size. Empty
    * codes drop (the standard empty-cluster rule).
    */
  def pqTrainCodebook(corpus: DataFrame, idCol: String, vecCol: String,
                      m: Int, subDim: Int, ksub: Int, iters: Int): DataFrame = {
    require(iters >= 0 && iters <= 100, s"iters must be in [0,100], got $iters")
    val sub = Staging.stage(
      corpus.select(col(idCol).as("pid"), col(vecCol).as("v"))
        .withColumn("ms", explode(sequence(lit(0), lit(m - 1))))
        .select(col("pid"), col("ms"),
          expr(s"slice(v, ms * $subDim + 1, $subDim)").as("sv"))
        .withColumn("sn2", VectorFns.norm2Fixed9(col("sv"))),
      "pq_sub")
    var cur = Staging.stage(
      pqSeedCodebook(corpus, idCol, vecCol, m, subDim, ksub), "pq_cb_0")
    for (i <- 1 to iters) {
      val cb = broadcast(cur.df
        .withColumn("cn2", VectorFns.norm2Fixed9(col("cvec"))))
      val assigned = sub.df.join(cb, Seq("ms"))
        .select(col("pid"), col("ms"), col("sv"), col("code"),
          (col("sn2") + col("cn2")
            - lit(2L) * VectorFns.dotFixed9(col("sv"), col("cvec"))).as("d"))
        .groupBy("pid", "ms")
        .agg(min_by(struct(col("code"), col("sv")), struct(col("d"), col("code"))).as("b"))
        .select(col("ms"), col("b.code").as("code"), col("b.sv").as("sv"))
      val next = assigned
        .select(col("ms"), col("code"), posexplode(col("sv")).as(Seq("dim", "x")))
        .select(col("ms"), col("code"), col("dim"),
          floor(col("x").cast("double") * lit(1e9)).cast("long").as("x9"))
        .groupBy("ms", "code", "dim")
        .agg((sum(col("x9")).cast("double") / count(lit(1)) / lit(1e9)).as("mean_val"))
        .groupBy("ms", "code")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("mean_val")))),
          s => s.getField("mean_val")).as("cvec"))
      val staged = Staging.stage(next, s"pq_cb_$i")
      cur.delete()
      cur = staged
    }
    sub.delete()
    cur.df
  }

  /** ADC shortlist + EXACT re-rank — the standard two-stage PQ
    * deployment: [[pqTopK]] produces a `shortlist`-deep candidate list
    * from codes alone, and only those candidates' raw vectors are
    * fetched for an exact fixed-point L2 re-rank. The raw-vector read
    * is bounded to Q·shortlist rows (broadcast of the shortlist against
    * the corpus scan — the corpus never shuffles), so the expensive
    * full-precision math touches a vanishing fraction of a 100 TB
    * corpus while recall recovers most of the quantization loss
    * (measured in `tools.Recall`).
    */
  def pqTopKRerank(queries: DataFrame, corpusCodes: DataFrame, corpus: DataFrame,
                   codebook: DataFrame, idCol: String, vecCol: String,
                   k: Int, shortlist: Int, m: Int, subDim: Int): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val short = pqTopK(queries, corpusCodes, codebook, idCol, vecCol,
      shortlist, m, subDim).select(col("qid"), col("nid"))
    val qn = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      VectorFns.norm2Fixed9(col(vecCol)).as("qn2"))
    val cn = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"),
      VectorFns.norm2Fixed9(col(vecCol)).as("nn2"))
    val fetched = cn.join(broadcast(short.join(qn, Seq("qid"))), Seq("nid"))
      .select(col("qid"), col("nid"),
        (col("qn2") + col("nn2")
          - lit(2L) * VectorFns.dotFixed9(col("qv"), col("nv"))).as("dist"))
    val w = Window.partitionBy("qid").orderBy(col("dist"), col("nid"))
    fetched.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: the query side
    * computes its m·ksub lookup table of EXACT sub-distances to every
    * sub-centroid (queries stay uncompressed — the "asymmetric" in
    * ADC), and each candidate's approximate distance is the sum of m
    * integer lookups — no float math touches the corpus scan. The LUT
    * (Q·m·ksub rows, tiny by contract) broadcasts; the codes table
    * streams through a map-side join and the (qid, nid) partial sums
    * combine before the exchange. Output (qid, nid, adist, rank) with
    * adist the fixed-point approximate squared L2 (smaller = nearer).
    */
  def pqTopK(queries: DataFrame, corpusCodes: DataFrame, codebook: DataFrame,
             idCol: String, vecCol: String, k: Int, m: Int, subDim: Int): DataFrame = {
    val qlut = pqDists(queries, idCol, vecCol, codebook, m, subDim, "q")
      .withColumnRenamed("d", "pd")
    val probe = corpusCodes
      .select(col(idCol).as("nid"), posexplode(col("codes")).as(Seq("ms", "code")))
      .join(broadcast(qlut), Seq("ms", "code"))
      .filter(col("qid") =!= col("nid"))
      .groupBy("qid", "nid").agg(sum(col("pd")).as("adist"))
    val w = Window.partitionBy("qid").orderBy(col("adist"), col("nid"))
    probe.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF-PQ composed search — the production ANN architecture (Jégou
    * et al. 2011 as deployed: FAISS `IVFx,PQy`): the corpus is (a)
    * partitioned into IVF cells by nearest centroid and (b) compressed
    * to `m` PQ codes; a query probes its `nProbe` nearest cells and
    * scores ONLY their members, by ADC table lookups — never touching a
    * raw corpus vector. The two levers compose multiplicatively: cells
    * cut candidates ~C/nProbe×, PQ cuts bytes-per-candidate ~32×, so
    * the scan cost is (corpus/C·nProbe) · m integer adds per query.
    * Both the cell assignment and the encode collapse their broadcast
    * fan-outs BEFORE any exchange (the [[ivfTopK]] / [[pqEncode]]
    * discipline); the ADC lookup table broadcasts (Q·m·ksub rows).
    * Ranking is by exact integer ADC distance, ties on id.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
                codebook: DataFrame, idCol: String, vecCol: String, cidCol: String,
                k: Int, nProbe: Int, m: Int, subDim: Int): DataFrame = {
    val cent = centroids.select(col(cidCol).as("cid"), col(vecCol).as("cvec"),
      VectorFns.norm2Fixed9(col(vecCol)).as("cn2"))
    def scored(side: DataFrame, p: String): DataFrame =
      side.join(broadcast(cent))
        .select(col(s"${p}id"), col("cid"),
          VectorFns.cosineFrom(VectorFns.dotFixed9(col(s"${p}vec"), col("cvec")),
            col(s"${p}n2"), col("cn2")).as("csim"))
    val cells = scored(withNorm(corpus, idCol, vecCol, "n"), "n")
      .groupBy("nid")
      .agg(max_by(col("cid"), struct(col("csim"), -col("cid"))).as("cid"))
    val wProbe = Window.partitionBy("qid").orderBy(col("csim").desc, col("cid"))
    val probes = scored(withNorm(queries, idCol, vecCol, "q"), "q")
      .withColumn("rn", row_number().over(wProbe)).filter(col("rn") <= nProbe)
      .select(col("qid"), col("cid"))
    val codes = pqEncode(corpus, idCol, vecCol, codebook, m, subDim)
    val qlut = pqDists(queries, idCol, vecCol, codebook, m, subDim, "q")
      .withColumnRenamed("d", "pd")
    val cand = probes.join(cells, Seq("cid"))
      .filter(col("qid") =!= col("nid")).select("qid", "nid")
    val adc = cand
      .join(codes.select(col(idCol).as("nid"), col("codes")), Seq("nid"))
      .select(col("qid"), col("nid"), posexplode(col("codes")).as(Seq("ms", "code")))
      .join(broadcast(qlut), Seq("qid", "ms", "code"))
      .groupBy("qid", "nid").agg(sum(col("pd")).as("adist"))
    val w = Window.partitionBy("qid").orderBy(col("adist"), col("nid"))
    adc.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  // ------------------------------------------------ Scalar quantization

  /** SQ8 per-dimension corpus stats in the 1e9 fixed-point domain:
    * (dim, mn, mx). One posexplode + one map-side-combining min/max
    * aggregate — the state is d rows regardless of corpus size.
    */
  def sq8Stats(corpus: DataFrame, vecCol: String): DataFrame =
    corpus.select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("dim"),
        floor(col("x").cast("double") * lit(1e9)).cast("long").as("fx"))
      .groupBy("dim").agg(min(col("fx")).as("mn"), max(col("fx")).as("mx"))

  /** SCALAR-QUANTIZATION (SQ8) encode — the third production vector
    * compression besides raw floats and PQ (FAISS `SQ8`): each
    * dimension quantizes INDEPENDENTLY to a byte,
    * code = ⌊(x − mn_d)·255 / (mx_d − mn_d)⌋, a 4× shrink at d=64
    * float32 with far better per-vector fidelity than PQ's 32×. All
    * arithmetic is integral over the 1e9 fixed-point domain (both
    * operands non-negative, so trunc-div ≡ floor-div — identical in
    * every engine). Output (id, codes: array<long> of 0..255).
    *
    * Scale shape: stats broadcast (d rows); the encode fan-out is d
    * narrow rows per vector collapsing back to one row before any
    * exchange — the [[pqEncode]] discipline.
    */
  def sq8Encode(corpus: DataFrame, idCol: String, vecCol: String,
                stats: DataFrame): DataFrame =
    corpus.select(col(idCol).as("nid"), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .withColumn("fx", floor(col("x").cast("double") * lit(1e9)).cast("long"))
      .join(broadcast(stats), Seq("dim"))
      .withColumn("code", when(col("mx") === col("mn"), lit(0L))
        .otherwise(expr("((fx - mn) * 255) div (mx - mn)")))
      .groupBy("nid")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("code")))),
        p => p("code")).as("codes"))
      .select(col("nid").as(idCol), col("codes"))

  /** SQ8 reconstruction: codes → fixed-point vectors,
    * rfx_d = mn_d + ⌊code·(mx_d − mn_d) / 255⌋. Same integral-division
    * discipline as [[sq8Encode]].
    */
  def sq8Recon(corpusCodes: DataFrame, idCol: String, stats: DataFrame): DataFrame =
    corpusCodes.select(col(idCol).as("nid"), posexplode(col("codes")).as(Seq("dim", "code")))
      .join(broadcast(stats), Seq("dim"))
      .withColumn("rfx", col("mn") + expr("(code * (mx - mn)) div 255"))
      .groupBy("nid")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("rfx")))),
        p => p("rfx")).as("rfx"))

  /** SQ8 ADC top-k: exact squared-L2 between the query's fixed-point
    * vector and every RECONSTRUCTED corpus vector, in micro units
    * (du = ⌊|qfx − rfx| / 1000⌋ per dimension; |du| ≤ ~4·10⁶ so
    * Σ du² fits a long at any d ≤ 4096 — and ⌊a/1000.0⌋ over integers
    * this size is IEEE-exact, so every engine lands on the identical
    * integer distance). Declared brute baseline like
    * [[bruteForceTopK]]: Q·N by contract — bound Q per job and let the
    * 4×-smaller code table stream through executors.
    */
  def sq8TopK(queries: DataFrame, corpusCodes: DataFrame, stats: DataFrame,
              idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"),
      transform(col(vecCol),
        x => floor(x.cast("double") * lit(1e9)).cast("long")).as("qfx"))
    val du = zip_with(col("qfx"), col("rfx"),
      (a, b) => floor(abs(a - b) / lit(1000.0)).cast("long"))
    val d2 = aggregate(du, lit(0L), (acc, x) => acc + x * x)
    val sims = q.join(sq8Recon(corpusCodes, idCol, stats), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), d2.as("d2"))
    val w = Window.partitionBy("qid").orderBy(col("d2"), col("nid"))
    sims.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("d2"), col("rank"))
  }

  // --------------------------------------- Contrastive-training negatives

  /** HARD-NEGATIVE MINING — the contrastive-training data stage (DPR /
    * SimCSE style): per query, the top-k most similar corpus vectors
    * whose similarity stays BELOW `simCeilingMilli`/1000 — the hardest
    * candidates that are NOT near-duplicates (near-dups above the
    * ceiling are positives/copies and would poison the negative set).
    * Exact fixed-point similarities, rank ties on id. Declared Q·N
    * baseline like [[bruteForceTopK]]; at scale the candidate pass
    * swaps to any blocked ANN ([[ivfTopK]] etc.) with the same
    * ceiling filter.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, k: Int, simCeilingMilli: Int): DataFrame = {
    val q = withNorm(queries, idCol, vecCol, "q")
    val c = withNorm(corpus, idCol, vecCol, "n")
    val sims = q.join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        VectorFns.cosineFrom(
          VectorFns.dotFixed9(col("qvec"), col("nvec")), col("qn2"), col("nn2")).as("sim_raw"))
      .filter(col("sim_raw") * 1000 < simCeilingMilli)
    rank(sims, k)
  }

  /** Deterministic RANDOM-NEGATIVE sampling — the other half of a
    * contrastive batch: per query, `k` corpus vectors chosen by an
    * md5 draw over (qid, nid), EXCLUDING the query itself and its
    * `excludeTopM` nearest neighbors (random negatives that are
    * secretly near-positives corrupt the loss). Pure hash ranking —
    * reproducible across engines, partitionings, and reruns; no RNG
    * state anywhere.
    *
    * Cost contract (the 100 TB shape): the draw ranks by the md5 hash
    * ASCENDING, so the winners per query are exactly the candidates in
    * the lowest slice of the hash space — a filter on the draw's 32-bit
    * prefix cuts the Q·N pair stream to ~64·(k+M) expected survivors
    * per query BEFORE anything shuffles, so the window sorts Q·O(k)
    * rows instead of Q·N. The pair enumeration itself stays a map-side
    * broadcast nested loop (no shuffle, codegen'd), the same declared
    * Q·N scan contract as [[bruteForceTopK]]'s exclusion pass. A
    * per-query under-fill check (possible only with astronomically
    * unlucky hashes or a corpus smaller than the slice) falls back to
    * the unfiltered draw for just those queries, so the result is
    * bit-identical to the naive global ranking at any N.
    */
  def sampleNegatives(queries: DataFrame, corpus: DataFrame, idCol: String,
                      vecCol: String, k: Int, excludeTopM: Int): DataFrame = {
    val near = bruteForceTopK(queries, corpus, idCol, vecCol, excludeTopM)
      .select(col("qid"), col("nid"))
    val n = corpus.count()
    // slice sized for ~64·(k+M)+256 expected survivors per query: the
    // anti-join removes at most M of them, and P[< k survive] is
    // Chernoff-negligible — the fallback branch exists for exactness,
    // not for throughput.
    val target = 64L * (k + excludeTopM) + 256L
    val thr = math.min(0xFFFFFFFFL, (4294967296L * target) / math.max(n, 1L) + 1L)
    val thrHex = f"$thr%08x"
    def drawsOf(pairs: DataFrame) = pairs
      .filter(col("qid") =!= col("nid"))
      .withColumn("draw",
        md5(concat(col("qid").cast("string"), lit(":"), col("nid").cast("string"))))
    val allPairs = queries.select(col(idCol).as("qid"))
      .crossJoin(corpus.select(col(idCol).as("nid")))
    val w = Window.partitionBy("qid").orderBy(col("draw"), col("nid"))
    def ranked(draws: DataFrame) = draws
      .join(near, Seq("qid", "nid"), "left_anti")
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("draw"), col("rank"))
    val sliced = ranked(drawsOf(allPairs)
      .filter(substring(col("draw"), 1, 8) <= lit(thrHex)))
    if (thr >= 0xFFFFFFFFL) sliced // slice covers the whole hash space
    else {
      // under-filled = FEWER than k survivors, including ZERO: left-join
      // the full query set against the per-qid counts so a query whose
      // every candidate hashed above the slice (no group row at all)
      // still falls back — without it such a query would silently return
      // no negatives, breaking the bit-identical-at-any-N contract
      val short = queries.select(col(idCol).as("qid"))
        .join(sliced.groupBy("qid").agg(count(lit(1)).as("n_got")),
          Seq("qid"), "left")
        .filter(coalesce(col("n_got"), lit(0L)) < k).select("qid")
      sliced.join(broadcast(short), Seq("qid"), "left_anti")
        .unionByName(ranked(drawsOf(allPairs.join(broadcast(short), Seq("qid")))))
    }
  }

  // --------------------------------------------------- graph-based ANN

  /** k-NN GRAPH construction — the index side of graph-based ANN (the
    * HNSW/NSG architecture family): per corpus vector its `degree`
    * most-similar neighbors, (src, nbr) edge rows. Built here with the
    * exact [[bruteForceTopK]] pass (declared N² baseline, like every
    * brute builder in this file); at corpus scale the build swaps to
    * any blocked candidate source with the same output contract —
    * IVF-probed candidates ([[ivfTopK]]) or NN-descent rounds — and the
    * SEARCH below is unchanged, which is the point: the graph is the
    * index artifact, the build is pluggable.
    */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String,
               degree: Int): DataFrame = {
    require(degree >= 1, s"degree must be >= 1, got $degree")
    bruteForceTopK(corpus, corpus, idCol, vecCol, degree)
      .select(col("qid").as("src"), col("nid").as("nbr"))
  }

  /** NN-DESCENT graph build (Dong et al., WWW 2011) — the SCALE path
    * behind [[knnGraph]]'s declared-N² exact baseline: start from a
    * deterministic md5-derived bucket graph and refine — each round
    * proposes every TWO-HOP neighbor over the symmetrized current graph
    * as a candidate, scores it exactly, and keeps the top-`degree` per
    * node. The corpus never self-joins: round work is bounded by
    * N·(2·degree)² graph-local candidate pairs, and rounds are staged
    * at O(1) plan depth (the [[graphAnnTopK]] discipline).
    *
    * Init: two independent hash bucketings at ~(degree+1) nodes per
    * bucket, complete within each bucket — a pseudo-random regular
    * graph any engine rebuilds identically from its own md5 (two salts
    * make an everywhere-isolated node e^(-2λ)-improbable). Everything
    * downstream is deterministic: exact fixed-point cosine, ties on
    * id — so the learned graph is hash-checkable (q189 replays init
    * and every round as CTEs).
    *
    * Output: (src, nbr, sim, rank) — [[graphAnnTopK]] accepts it
    * directly; `tools/Recall` measures search recall through the
    * descent graph against the exact-graph walk.
    */
  def knnGraphDescent(corpus: DataFrame, idCol: String, vecCol: String,
                      degree: Int, rounds: Int,
                      maxBroadcastNorms: Long = 4000000L): DataFrame = {
    require(degree >= 1, s"degree must be >= 1, got $degree")
    require(rounds >= 1 && rounds <= 8, s"rounds must be in [1,8], got $rounds")
    // the norm table feeds two join sides of EVERY round's scoring pass
    // (and the final re-score): stage once instead of re-running its
    // producing corpus scan 2·rounds+2 times. A staged frame carries no
    // size statistics, so the scoring joins would silently degrade from
    // broadcast to sort-merge (measured slower at small scale); the hint
    // is SIZE-GATED like [[graphWalk]]'s frontier contract — above
    // `maxBroadcastNorms` rows the staged table shuffle-joins instead,
    // which is the correct shape when the corpus outgrows executor
    // memory anyway.
    val cSt = Staging.stage(withNorm(corpus, idCol, vecCol, "n"), "nnd_norms")
    val nCount = cSt.df.count()
    val useHint = nCount <= maxBroadcastNorms
    def hintC(df: DataFrame) = if (useHint) broadcast(df) else df
    val c = cSt.df
    val h60 = (x: org.apache.spark.sql.Column) =>
      conv(substring(md5(x), 1, 15), 16, 10).cast("long")
    val b = math.max(nCount / (degree + 1L), 1L)
    // id universe from the staged norms — the corpus scan already ran
    def bucketed(salt: Int) = c.select(col("nid").as("id"),
      (h60(concat(lit(s"nnd$salt:"), col("nid").cast("string"))) % b).as("bk"))
    // candidate streams dedup on (src, nbr) and are then ranked by a
    // src-partitioned window: repartitioning by src FIRST lets the
    // dedup aggregate (grouping keys ⊇ src) AND the window share that
    // single exchange — one candidate-stream shuffle per pass, not two
    def dedupBySrc(pairs: DataFrame) =
      pairs.repartition(col("src")).dropDuplicates("src", "nbr")
    val init = dedupBySrc((0 to 1).map { s =>
      val x = bucketed(s)
      x.join(x.select(col("id").as("id2"), col("bk")), Seq("bk"))
        .filter(col("id") =!= col("id2"))
        .select(col("id").as("src"), col("id2").as("nbr"))
    }.reduce(_.unionByName(_)))
    val sim = VectorFns.cosineFrom(
      VectorFns.dotFixed9(col("svec"), col("nvec")), col("sn2"), col("nn2"))
    def scoreRank(pairs: DataFrame) = pairs // (src, nbr) → + sim, rn
      .join(hintC(c.select(col("nid").as("src"), col("nvec").as("svec"),
        col("nn2").as("sn2"))), Seq("src"))
      .join(hintC(c.select(col("nid").as("nbr"), col("nvec"), col("nn2"))), Seq("nbr"))
      .select(col("src"), col("nbr"), sim.as("sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("src").orderBy(col("sim").desc, col("nbr"))))
    def topDeg(pairs: DataFrame) =
      scoreRank(pairs).filter(col("rn") <= degree).select("src", "nbr")
    var edges = Staging.stage(topDeg(init), "nnd_e0")
    (1 to rounds).foreach { r =>
      val sym = edges.df
        .unionByName(edges.df.select(col("nbr").as("src"), col("src").as("nbr")))
        .distinct()
      val cand = dedupBySrc(
        sym.join(sym.select(col("src").as("nbr"), col("nbr").as("hop2")),
          Seq("nbr"))
        .filter(col("hop2") =!= col("src"))
        .select(col("src"), col("hop2").as("nbr"))
        .unionByName(edges.df))
      val next = Staging.stage(topDeg(cand), s"nnd_e$r")
      edges.delete()
      edges = next
    }
    // stage the final scored table too: the graph is an INDEX — its
    // consumers (a beam search touches it once per hop) must read a
    // materialization, not re-run the scoring join per consumption
    val fin = Staging.stage(
      scoreRank(edges.df).filter(col("rn") <= degree)
        .select(col("src"), col("nbr"), col("sim"),
          col("rn").cast("int").as("rank")),
      "nnd_fin")
    edges.delete()
    cSt.delete()
    fin.df
  }

  /** Dev hook for [[graft.tools.InnerPlans]]: the plan of ONE NN-descent
    * scoring pass (the plan every round pays — explain on the descent
    * output only shows the final staging scan), in both shapes: the
    * pre-r15 form that re-derived the norm table from the corpus on both
    * join sides of every pass, and the staged + size-gated-broadcast
    * form [[knnGraphDescent]] runs now.
    */
  private[graft] def explainDescentScore(corpus: DataFrame, idCol: String,
                                         vecCol: String, degree: Int): Unit = {
    val h60 = (x: org.apache.spark.sql.Column) =>
      conv(substring(md5(x), 1, 15), 16, 10).cast("long")
    val nCount = corpus.count()
    val b = math.max(nCount / (degree + 1L), 1L)
    val sim = VectorFns.cosineFrom(
      VectorFns.dotFixed9(col("svec"), col("nvec")), col("sn2"), col("nn2"))
    def scorePlan(c: DataFrame, hint: Boolean): DataFrame = {
      def h(df: DataFrame) = if (hint) broadcast(df) else df
      def bucketed(salt: Int) = c.select(col("nid").as("id"),
        (h60(concat(lit(s"nnd$salt:"), col("nid").cast("string"))) % b).as("bk"))
      val pairs = (0 to 1).map { s =>
        val x = bucketed(s)
        x.join(x.select(col("id").as("id2"), col("bk")), Seq("bk"))
          .filter(col("id") =!= col("id2"))
          .select(col("id").as("src"), col("id2").as("nbr"))
      }.reduce(_.unionByName(_))
      // before: plain distinct — its own (src, nbr) exchange on top of
      // the window's src exchange; after: one src repartition shared by
      // the dedup aggregate and the ranking window
      val init =
        if (hint) pairs.repartition(col("src")).dropDuplicates("src", "nbr")
        else pairs.distinct()
      init
        .join(h(c.select(col("nid").as("src"), col("nvec").as("svec"),
          col("nn2").as("sn2"))), Seq("src"))
        .join(h(c.select(col("nid").as("nbr"), col("nvec"), col("nn2"))), Seq("nbr"))
        .select(col("src"), col("nbr"), sim.as("sim"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("src").orderBy(col("sim").desc, col("nbr"))))
        .filter(col("rn") <= degree).select("src", "nbr")
    }
    println("---- descent scoring pass, BEFORE (norm table re-derived per join side)")
    scorePlan(withNorm(corpus, idCol, vecCol, "n"), hint = false).explain("formatted")
    println("---- descent scoring pass, AFTER (norms staged once + size-gated broadcast)")
    val cSt = Staging.stage(withNorm(corpus, idCol, vecCol, "n"), "nnd_explain")
    scorePlan(cSt.df, hint = true).explain("formatted")
    cSt.delete()
  }

  /** BEAM SEARCH over a k-NN graph — the query side of graph-based ANN,
    * completing the production-ANN architecture pair next to the
    * IVF/PQ/SQ8 cell family: from a deterministic entry point (the
    * minimum corpus id), each hop expands the frontier's graph
    * neighbors, scores them exactly, and keeps the top-`beam` per query
    * (ties on id); after `hops` rounds the frontier's top-k (self
    * excluded) is the answer.
    *
    * Spark-first shape: fixed staged rounds at O(1) plan depth (the
    * [[graft.operators.Graph.bfsHops]] discipline — one edges join +
    * one bounded window per hop); per-query state is `beam` rows, per
    * hop work is ≤ beam·degree sim evaluations, so search cost is
    * independent of corpus size once the graph exists. The edges table
    * shuffles on `src` — bucketed on it, the hop join is co-located.
    * Exact fixed-point cosine everywhere, so every engine walks the
    * IDENTICAL path (the oracle replays all hops as CTEs).
    *
    * Self-similarity (sim = 1.0) keeps an indexed query pinned at its
    * own true neighborhood during the walk — excluded only from the
    * final ranking, as a search for an indexed vector should be.
    */
  def graphAnnTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                   vecCol: String, graph: DataFrame, k: Int, beam: Int,
                   hops: Int,
                   maxBroadcastFrontier: Long = 4000000L): DataFrame = {
    require(k >= 1 && beam >= k, s"need beam >= k >= 1, got beam=$beam k=$k")
    require(hops >= 1 && hops <= 16, s"hops must be in [1,16], got $hops")
    val q = withNorm(queries, idCol, vecCol, "q")
    // deterministic single entry point: the minimum corpus id (1 row —
    // always broadcastable); [[graphAnnTopKSeeded]] is the recall fix
    val entry = corpus.agg(min(col(idCol)).as("nid"))
    val entries = q.select(col("qid")).crossJoin(broadcast(entry))
    graphWalk(q, corpus, idCol, vecCol, graph, k, beam, hops, entries,
      maxBroadcastFrontier)
  }

  /** MULTI-ENTRY graph-ANN search — [[graphAnnTopK]] seeded from IVF
    * centroids instead of the global min-id: each query enters the walk
    * at the REPRESENTATIVE member (highest centroid-sim, smaller id on
    * ties) of its `nProbe` nearest cells. A single far entry point is
    * exactly what floors small-beam recall (measured 0.169 at
    * deg=8/beam=8 from min-id); nearest-cell seeds start every walk in
    * the query's own region — the role HNSW's upper layers / IVF-seeded
    * NSG entry points play in production graph indexes.
    *
    * Scale shape: the cell assignment is one corpus scan + map-side
    * max_by (the [[ivfAssign]] shape — at serving time build it once
    * and reuse; it is index metadata, |corpus| rows, its `reps`
    * reduction |centroids| rows). Probes are query-side only. The walk
    * itself is [[graphAnnTopK]]'s: per-hop work ≤ Q·beam·degree sims,
    * corpus-size-independent once graph + assignment exist.
    */
  def graphAnnTopKSeeded(queries: DataFrame, corpus: DataFrame,
                         centroids: DataFrame, idCol: String, vecCol: String,
                         cidCol: String, graph: DataFrame, nProbe: Int,
                         k: Int, beam: Int, hops: Int,
                         maxBroadcastFrontier: Long = 4000000L): DataFrame = {
    require(k >= 1 && beam >= k, s"need beam >= k >= 1, got beam=$beam k=$k")
    require(hops >= 1 && hops <= 16, s"hops must be in [1,16], got $hops")
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val q = withNorm(queries, idCol, vecCol, "q")
    // cell assignment WITH the winning centroid sim (ivfAssign drops it)
    val asg = ivfScored(withNorm(corpus, idCol, vecCol, "n"), centroids,
        vecCol, cidCol, "n")
      .groupBy("nid")
      .agg(max_by(struct(col("cid"), col("csim")),
        struct(col("csim"), -col("cid"))).as("b"))
      .select(col("nid"), col("b.cid").as("cid"), col("b.csim").as("csim"))
    // one representative per cell: its member closest to the centroid
    val reps = asg.groupBy("cid")
      .agg(max_by(col("nid"), struct(col("csim"), -col("nid"))).as("nid"))
    val probes = ivfProbes(queries, centroids, idCol, vecCol, cidCol, nProbe)
      .select(col("qid"), col("cid"))
    val entries = probes.join(reps, Seq("cid")).select("qid", "nid").distinct()
    graphWalk(q, corpus, idCol, vecCol, graph, k, beam, hops, entries,
      maxBroadcastFrontier)
  }

  /** TWO-LAYER HIERARCHICAL graph ANN — the HNSW layer architecture
    * itself (upper layer = a sparse deterministic sample of the corpus
    * with its own kNN graph; search walks the small layer first and
    * uses its winners as entry points into the full graph), completing
    * the entry-point ladder: min-id ([[graphAnnTopK]]) → IVF seeds
    * ([[graphAnnTopKSeeded]]) → learned-layer seeds (this). Unlike the
    * IVF seeding it needs NO centroid training — the upper layer is
    * any deterministic id-rule subset, and its graph is tiny (|L1|
    * nodes), so the layer-1 walk costs beam1·degree1 sims/hop against
    * a graph that often fits in one executor.
    *
    * Both walks are [[graphAnnTopK]]'s staged beam search (same
    * size-gated broadcast contract); layer-1 candidates only ever
    * reference layer-1 nodes (its graph is closed over the subset), so
    * scoring runs against the shared corpus norm table.
    *
    * @param graph1 kNN edges over `layer1`'s nodes only
    * @param layer1 the upper-layer node ids (one `idCol` column)
    */
  def graphAnnTopKHier(queries: DataFrame, corpus: DataFrame, idCol: String,
                       vecCol: String, graph0: DataFrame, graph1: DataFrame,
                       layer1: DataFrame, k: Int, beam1: Int, hops1: Int,
                       beam: Int, hops: Int,
                       maxBroadcastFrontier: Long = 4000000L): DataFrame = {
    require(k >= 1 && beam >= k, s"need beam >= k >= 1, got beam=$beam k=$k")
    require(beam1 >= 1, s"beam1 must be >= 1, got $beam1")
    require(hops >= 1 && hops <= 16, s"hops must be in [1,16], got $hops")
    require(hops1 >= 1 && hops1 <= 16, s"hops1 must be in [1,16], got $hops1")
    val q = withNorm(queries, idCol, vecCol, "q")
    val entry1 = layer1.agg(min(col(idCol)).as("nid"))
    val e1 = q.select(col("qid")).crossJoin(broadcast(entry1))
    val l1 = graphWalk(q, corpus, idCol, vecCol, graph1, beam1, beam1, hops1,
      e1, maxBroadcastFrontier)
    graphWalk(q, corpus, idCol, vecCol, graph0, k, beam, hops,
      l1.select("qid", "nid"), maxBroadcastFrontier)
  }

  /** The shared beam-search walk behind both graph-ANN entries.
    *
    * BROADCAST CONTRACT (the caller-contract pattern of
    * `ContentFilter`): the frontier is Q·beam rows and is re-broadcast
    * every hop — the hint that keeps the corpus/graph streaming
    * map-side (un-hinted, the 100× corpus shuffled the 1.2M-edge graph
    * every hop: 86.7 s vs ~38 s). That is only safe while Q·beam stays
    * driver-sized, so the hint is SIZE-GATED: above
    * `maxBroadcastFrontier` (default 4M rows ≈ tens of MB) the walk
    * falls back to plain shuffle joins — same rows, same hashes, no
    * driver OOM — and a large query batch should instead be split into
    * bounded sub-batches to win the hint back.
    */
  private def graphWalk(q: DataFrame, corpus: DataFrame, idCol: String,
                        vecCol: String, graph: DataFrame, k: Int, beam: Int,
                        hops: Int, entries: DataFrame,
                        maxBroadcastFrontier: Long): DataFrame = {
    // corpus norms feed every hop's scoring join — stage once instead
    // of re-scanning (and re-aggregating 64-dim norms) per hop
    val cStage = Staging.stage(withNorm(corpus, idCol, vecCol, "n"), "gann_norms")
    val c = cStage.df
    val useHint = q.count() * beam <= maxBroadcastFrontier
    def hintB(df: DataFrame) = if (useHint) broadcast(df) else df
    val sim = VectorFns.cosineFrom(
      VectorFns.dotFixed9(col("qvec"), col("nvec")), col("qn2"), col("nn2"))
    def scored(pairs: DataFrame) = hintB(pairs) // (qid, nid) → + sim
      .join(c, Seq("nid")).join(hintB(q), Seq("qid"))
      .select(col("qid"), col("nid"), sim.as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    def topBeam(scoredPairs: DataFrame) = scoredPairs
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= beam)
      .select("qid", "nid", "sim")
    var frontier = Staging.stage(topBeam(scored(entries)), "gann_f0")
    (1 to hops).foreach { h =>
      val cand = hintB(frontier.df.select(col("qid"), col("nid")))
        .join(graph.select(col("src").as("nid"), col("nbr")), Seq("nid"))
        .select(col("qid"), col("nbr").as("nid"))
        .unionByName(frontier.df.select(col("qid"), col("nid")))
      // hinted path: the scoring joins stream the corpus against a
      // broadcast frontier, so a pre-scoring dedup exchange can never
      // be reused by the ranking window — dedup AFTER scoring instead,
      // sharing the window's single qid exchange (sim is deterministic
      // per (qid, nid), so scoring duplicates first changes nothing).
      // Unhinted path: dedup BEFORE scoring — duplicates would inflate
      // the pair shuffle, and the second scoring join already leaves
      // the frame qid-partitioned for the window.
      val next = Staging.stage(
        if (useHint)
          topBeam(scored(cand).repartition(col("qid"))
            .dropDuplicates("qid", "nid"))
        else topBeam(scored(cand.distinct())),
        s"gann_f$h")
      frontier.delete()
      frontier = next
    }
    // the result reads only the staged final frontier — the norms
    // stage has no remaining consumer
    cStage.delete()
    frontier.df.filter(col("qid") =!= col("nid"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rank"))
  }

  /** LATE-INTERACTION re-rank (the ColBERT MaxSim architecture — the
    * rerank tier of the retrieval ladder after BM25 / dense ANN / RRF
    * hybrid): treat each vector as `m` sub-vectors of `subDim` dims
    * (token-embedding granularity) and score a candidate by
    * Σ_i max_j ⟨q_i, d_j⟩ — every query sub-vector matches its best
    * document sub-vector. Runs over a FIRST-STAGE SHORTLIST only
    * ((qid, nid) pairs from any retriever), so the m² sub-dot fan-out
    * is |shortlist|·m² rows — bounded by the stage-1 contract, never
    * corpus-scale. Exact fixed-point dots keep every engine on the
    * identical ranking.
    */
  def lateInteractionRerank(queries: DataFrame, corpus: DataFrame,
                            shortlist: DataFrame, idCol: String,
                            vecCol: String, m: Int, subDim: Int,
                            k: Int): DataFrame = {
    require(m >= 1 && subDim >= 1, s"need m, subDim >= 1, got m=$m subDim=$subDim")
    require(k >= 1, s"k must be >= 1, got $k")
    val qs = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .withColumn("qi", explode(sequence(lit(0), lit(m - 1))))
      .select(col("qid"), col("qi"),
        expr(s"slice(qvec, qi * $subDim + 1, $subDim)").as("qsub"))
    val ds = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
      .withColumn("dj", explode(sequence(lit(0), lit(m - 1))))
      .select(col("nid"), col("dj"),
        expr(s"slice(nvec, dj * $subDim + 1, $subDim)").as("dsub"))
    val sub = shortlist.select(col("qid"), col("nid"))
      .join(qs, Seq("qid")).join(ds, Seq("nid"))
      .select(col("qid"), col("nid"), col("qi"), col("dj"),
        VectorFns.dotFixed9(col("qsub"), col("dsub")).as("d"))
    sub.groupBy(col("qid"), col("nid"), col("qi"))
      .agg(max(col("d")).as("mx"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("mx")).as("li_score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("li_score").desc, col("nid"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("li_score"), col("rank"))
  }

  private def rank(sims: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("sim_raw").desc, col("nid"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("sim_raw").as("sim"), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of two ranked lists —
    * the standard hybrid-retrieval combiner (lexical BM25 × semantic
    * ANN): fused(d) = Σ_lists floor(10⁶ / (k₀ + rank_list(d))), summed
    * over the lists that ranked d at all. Integer micro-units, so the
    * fusion is engine-exact and rank-order deterministic (ties break on
    * id).
    *
    * Inputs are (id, rank) lists ALREADY bounded to each retriever's
    * top-k — RRF therefore joins two k-row frames: at any corpus scale
    * the fusion stage is constant-sized, and the expensive work stays
    * inside the retrievers where it is already blocked/bounded.
    */
  /** N-LIST reciprocal-rank fusion — [[rrfFuse]] generalized to any
    * number of retrievers (lexical BM25 × dense ANN × MaxSim rerank ×
    * …): fused(d) = Σ_lists ⌊10⁶/(k₀+rank_l(d))⌋ over the lists that
    * ranked d, plus how many did (`n_lists` — the agreement signal).
    * Inputs are (id, rank) lists already bounded to each retriever's
    * top-k, so the fusion joins Σk rows at any corpus scale.
    */
  def rrfFuseN(lists: Seq[DataFrame], idCol: String,
               k0: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.size >= 2, s"need >= 2 ranked lists, got ${lists.size}")
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    lists.map(l => l.select(col(idCol).cast("long").as("id"),
        col("rank").cast("long").as("rank")))
      .reduce(_ unionByName _)
      .groupBy("id")
      .agg(sum(expr(s"1000000 div ($k0 + rank)")).as("rrf_u"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_u").desc, col("id")).limit(topK)
  }

  def rrfFuse(listA: DataFrame, listB: DataFrame, idCol: String,
              k0: Int = 60, topK: Int = 10): DataFrame = {
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val a = listA.select(col(idCol).cast("long").as("id"), col("rank").cast("long").as("rank_a"))
    val b = listB.select(col(idCol).cast("long").as("id"), col("rank").cast("long").as("rank_b"))
    a.join(b, Seq("id"), "full_outer")
      .select(col("id"), col("rank_a"), col("rank_b"),
        (coalesce(expr(s"1000000 div ($k0 + rank_a)"), lit(0L)) +
         coalesce(expr(s"1000000 div ($k0 + rank_b)"), lit(0L))).as("rrf_u"))
      .orderBy(col("rrf_u").desc, col("id")).limit(topK)
  }
}
