package graft.operators

import graft.{SparkSpec, Tables}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),   // closest to 0
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),  // opposite of 0
    (4L, Array(0.8f, 0.2f, 0.1f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine, excludes self, k bounds results") {
    val out = SimilaritySearch.bruteForceTopK(
      vecs.filter($"vec_id" === 0L), vecs, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(out.map(_._2).toSeq == Seq(1L, 4L, 2L)) // by descending cosine
    assert(out.head._3 > 0.98 && out.head._3 <= 1.0)
    assert(out.forall(_._1 == 0L) && out.length == 3)
  }

  test("bucketedTopK only searches the query's sign bucket") {
    val data = Seq(
      (0L, Array(1.0f, 1.0f, 0f, 0f)),   // bucket (+,+)
      (1L, Array(0.9f, 0.1f, 0f, 0f)),   // bucket (+,+)
      (2L, Array(-1.0f, 1.0f, 0f, 0f)),  // bucket (-,+)
      (3L, Array(0.5f, 0.9f, 0f, 0f))    // bucket (+,+)
    ).toDF("vec_id", "embedding")
    val out = SimilaritySearch.bucketedTopK(
      data.filter($"vec_id" === 0L), data, "vec_id", "embedding", k = 5, bits = 2)
      .as[(Long, Long, Double, Int)].collect()
    // same-bucket candidates only: vec2 lives in another sign bucket
    assert(out.map(_._2).toSet == Set(1L, 3L))
  }

  test("multi-probe recovers the across-one-hyperplane neighbor single-probe misses") {
    val data = Seq(
      (0L, Array(1.0f, 0.01f, 0f, 0f)),   // bucket (+,+): just above plane 2
      (1L, Array(1.0f, -0.01f, 0f, 0f)),  // bucket (+,-): its true nearest, across plane 2
      (2L, Array(-1.0f, -1.0f, 0f, 0f))   // far away in (-,-)
    ).toDF("vec_id", "embedding")
    val q = data.filter($"vec_id" === 0L)
    val single = SimilaritySearch.bucketedTopK(q, data, "vec_id", "embedding", k = 2, bits = 2)
      .as[(Long, Long, Double, Int)].collect()
    val multi = SimilaritySearch.bucketedTopKMultiProbe(q, data, "vec_id", "embedding", k = 2, bits = 2)
      .as[(Long, Long, Double, Int)].collect()
    assert(!single.map(_._2).contains(1L), "single probe must miss the cross-plane neighbor")
    assert(multi.map(_._2).contains(1L), "Hamming-1 probe must recover it")
    // and multi-probe still does NOT see Hamming-2 buckets
    assert(!multi.map(_._2).contains(2L))
  }

  test("IVF: candidates come only from probed cells; nProbe=all ≡ brute force") {
    val data = Seq(
      (0L, Array(1.0f, 0.05f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f, 0f)),
      (2L, Array(0.0f, 1.0f, 0f, 0f)),
      (3L, Array(-1.0f, 0.1f, 0f, 0f)),
      (4L, Array(0.8f, 0.3f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val q = data.filter($"vec_id" === 0L)
    // centroids: x-axis (cid 10) and y-axis (cid 11)
    val cent = Seq((10L, Array(1.0f, 0f, 0f, 0f)), (11L, Array(0f, 1.0f, 0f, 0f)))
      .toDF("cid", "embedding")
    // nProbe=1: query 0 probes the x-cell only → 2 (y-cell) and 3
    // (assigned to y-cell: cosine to x is negative) are never scored
    val one = SimilaritySearch.ivfTopK(q, data, cent, "vec_id", "embedding", "cid",
      k = 4, nProbe = 1).as[(Long, Long, Double, Int)].collect()
    assert(one.map(_._2).toSet == Set(1L, 4L))
    // probing every cell recovers the full ranking = brute force
    val all = SimilaritySearch.ivfTopK(q, data, cent, "vec_id", "embedding", "cid",
      k = 4, nProbe = 2).as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    val brute = SimilaritySearch.bruteForceTopK(q, data, "vec_id", "embedding", k = 4)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(all.map(_._2).toSeq == brute.map(_._2).toSeq)
  }

  test("recallAtK: exact vs itself is 1.0; multi-probe ≥ single-probe on random vectors") {
    val rnd = new scala.util.Random(7)
    val data = (0L until 200L).map(i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val q = data.filter($"vec_id" < 16)
    val exact = SimilaritySearch.bruteForceTopK(q, data, "vec_id", "embedding", k = 5)
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      SimilaritySearch.recallAtK(approx, exact).collect()(0).getDouble(1)
    assert(recall(exact) == 1.0)
    val single = recall(
      SimilaritySearch.bucketedTopK(q, data, "vec_id", "embedding", 5, bits = 6))
    val multi = recall(
      SimilaritySearch.bucketedTopKMultiProbe(q, data, "vec_id", "embedding", 5, bits = 6))
    assert(single > 0.0 && single < 1.0,
      s"6-bit single-probe on gaussian vectors should lose some neighbors (got $single)")
    assert(multi >= single, s"multi-probe ($multi) must not trail single-probe ($single)")
    assert(multi > single, s"on this seed multi-probe strictly improves recall")
  }

  test("semanticDedup collapses within-cell near-dup groups to min-id reps") {
    // centroids: x-axis (cid 100) and y-axis (cid 101). Near x-axis:
    // {1,2} nearly parallel (near-dups) and 3 well-separated; near
    // y-axis: 4 alone.
    val data = Seq(
      (1L, Array(1.0f, 0.02f, 0f, 0f)),
      (2L, Array(1.0f, 0.03f, 0f, 0f)),   // ~parallel to 1 → same group
      (3L, Array(0.6f, 0.4f, 0.6f, 0.0f)), // same cell, low sim to 1/2
      (4L, Array(0.1f, 1.0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val cent = Seq((100L, Array(1.0f, 0f, 0f, 0f)), (101L, Array(0f, 1.0f, 0f, 0f)))
      .toDF("cid", "cvec")
    val out = SimilaritySearch.semanticDedup(data, "vec_id", "embedding",
        cent, "cid", "cvec", simThreshold = 0.95)
      .select("vec_id", "cid", "rep", "kept")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((100L, 1L, true)))
    assert(out(2L) == ((100L, 1L, false)), "2 collapses into 1's group")
    assert(out(3L) == ((100L, 3L, true)), "low-sim cellmate survives as its own rep")
    assert(out(4L) == ((101L, 4L, true)))
  }

  test("cosine of a vector with itself is 1 within fixed-point tolerance") {
    val out = SimilaritySearch.bruteForceTopK(
      vecs, vecs.withColumn("vec_id", $"vec_id" + 100L), "vec_id", "embedding", k = 1)
      .as[(Long, Long, Double, Int)].collect()
    val self = out.filter(r => r._2 == r._1 + 100L)
    assert(self.nonEmpty && self.forall(r => math.abs(r._3 - 1.0) < 1e-6))
  }

  test("rrfFuse: hand-computed fusion, one-list docs, tie-break on id") {
    val s = spark
    import s.implicits._
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val sem = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val out = SimilaritySearch.rrfFuse(lex, sem, "doc_id", k0 = 60, topK = 10)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rrf_u")).toMap
    assert(out(20L) == 1000000L / 62 + 1000000L / 61)  // both lists
    assert(out(10L) == 1000000L / 61)                  // lex only
    assert(out(40L) == 1000000L / 62)                  // sem only
    assert(out(30L) == 1000000L / 63)
    // order: 20 first (two lists), then 10 vs 40: 16393 > 16129
    val order = SimilaritySearch.rrfFuse(lex, sem, "doc_id", 60, 10)
      .select("id").as[Long].collect().toSeq
    assert(order == Seq(20L, 10L, 40L, 30L))
    // topK truncates after fusion
    assert(SimilaritySearch.rrfFuse(lex, sem, "doc_id", 60, 2).count() == 2)
  }

  test("hardNegatives excludes everything at or above the similarity ceiling") {
    val s = spark
    import s.implicits._
    // q=(1,0); near-dup at cos≈0.999, hard negative at cos≈0.6, easy at cos≈0
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.999f, 0.04f)),
      (2L, Seq(0.6f, 0.8f)), (3L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = SimilaritySearch.hardNegatives(
      vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", 5, 950)
      .select("nid", "rank").as[(Long, Int)].collect().sortBy(_._2).toSeq
    assert(got.map(_._1) === Seq(2L, 3L), s"near-dup must be excluded: $got")
  }

  test("sampleNegatives never returns self or the excluded neighborhood, exactly k rows") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(spark, sf001).limit(100)
    val got = SimilaritySearch.sampleNegatives(
      e.filter($"vec_id" < 4), e, "vec_id", "embedding", k = 6, excludeTopM = 3)
    val near = SimilaritySearch.bruteForceTopK(
      e.filter($"vec_id" < 4), e, "vec_id", "embedding", 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val rows = got.select("qid", "nid").as[(Long, Long)].collect().toSeq
    assert(rows.groupBy(_._1).forall(_._2.size == 6))
    assert(rows.forall { case (q, n) => q != n && !near((q, n)) })
    // deterministic: rerun equals
    val again = SimilaritySearch.sampleNegatives(
      e.filter($"vec_id" < 4), e, "vec_id", "embedding", 6, 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSeq
    assert(rows.sorted === again.sorted)
  }

  test("graphAnnTopK on a complete graph equals brute force; " +
      "beam search is partition-stable") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(spark, sf001).limit(40)
    val q = e.filter($"vec_id" < 4)
    // complete graph (degree = N-1): one hop reaches everything, so the
    // walk must land exactly on the exhaustive answer
    val complete = SimilaritySearch.knnGraph(e, "vec_id", "embedding", 39)
    val got = SimilaritySearch.graphAnnTopK(q, e, "vec_id", "embedding",
      complete, k = 3, beam = 40, hops = 1)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    val brute = SimilaritySearch.bruteForceTopK(q, e, "vec_id", "embedding", 3)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    assert(got === brute, "complete-graph beam search must be exhaustive")
    // sparse graph: identical walk under any partitioning
    val sparse = SimilaritySearch.knnGraph(e, "vec_id", "embedding", 4)
    def walk(qs: org.apache.spark.sql.DataFrame,
             cs: org.apache.spark.sql.DataFrame) =
      SimilaritySearch.graphAnnTopK(qs, cs, "vec_id", "embedding", sparse,
        k = 3, beam = 4, hops = 3)
        .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    assert(walk(q, e) === walk(q.repartition(5), e.repartition(7)))
    intercept[IllegalArgumentException](SimilaritySearch.graphAnnTopK(
      q, e, "vec_id", "embedding", sparse, k = 5, beam = 4, hops = 1))
    intercept[IllegalArgumentException](SimilaritySearch.graphAnnTopK(
      q, e, "vec_id", "embedding", sparse, k = 1, beam = 2, hops = 0))
  }

  test("graphAnnTopKSeeded on a complete graph equals brute force; " +
      "broadcast fallback path is hash-identical") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(spark, sf001).limit(40)
    val q = e.filter($"vec_id" < 4)
    val cent = e.filter($"vec_id" < 8)
    val complete = SimilaritySearch.knnGraph(e, "vec_id", "embedding", 39)
    val got = SimilaritySearch.graphAnnTopKSeeded(q, e, cent, "vec_id",
      "embedding", "vec_id", complete, nProbe = 2, k = 3, beam = 40, hops = 1)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    val brute = SimilaritySearch.bruteForceTopK(q, e, "vec_id", "embedding", 3)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    assert(got === brute, "complete-graph seeded beam search must be exhaustive")
    // the size-gated broadcast fallback (frontier bound 0 → plain
    // shuffle joins) must produce the identical walk for BOTH variants
    val sparse = SimilaritySearch.knnGraph(e, "vec_id", "embedding", 4)
    def seeded(bound: Long) = SimilaritySearch.graphAnnTopKSeeded(
      q, e, cent, "vec_id", "embedding", "vec_id", sparse,
      nProbe = 2, k = 3, beam = 4, hops = 3, maxBroadcastFrontier = bound)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    assert(seeded(0L) === seeded(4000000L))
    def minId(bound: Long) = SimilaritySearch.graphAnnTopK(
      q, e, "vec_id", "embedding", sparse,
      k = 3, beam = 4, hops = 3, maxBroadcastFrontier = bound)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    assert(minId(0L) === minId(4000000L))
  }

  test("graphAnnTopKHier: complete layer-0 graph equals brute force; walk is partition-stable") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(spark, sf001).limit(40)
    val q = e.filter($"vec_id" < 4)
    val l1 = e.filter($"vec_id" % 4 === 0)
    val g1 = SimilaritySearch.knnGraph(l1, "vec_id", "embedding", 4)
      .localCheckpoint(true)
    // complete layer-0 graph + beam >= N: whatever layer 1 seeds, one
    // layer-0 hop reaches everything — must equal the exhaustive answer
    val complete = SimilaritySearch.knnGraph(e, "vec_id", "embedding", 39)
    val got = SimilaritySearch.graphAnnTopKHier(q, e, "vec_id", "embedding",
      complete, g1, l1.select("vec_id"),
      k = 3, beam1 = 2, hops1 = 2, beam = 40, hops = 1)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    val brute = SimilaritySearch.bruteForceTopK(q, e, "vec_id", "embedding", 3)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    assert(got === brute, "complete-graph hierarchical search must be exhaustive")
    // sparse graphs: identical two-layer walk under any partitioning
    val sparse = SimilaritySearch.knnGraph(e, "vec_id", "embedding", 4)
      .localCheckpoint(true)
    def walk(qs: org.apache.spark.sql.DataFrame,
             cs: org.apache.spark.sql.DataFrame) =
      SimilaritySearch.graphAnnTopKHier(qs, cs, "vec_id", "embedding",
        sparse, g1, l1.select("vec_id"),
        k = 3, beam1 = 2, hops1 = 2, beam = 4, hops = 2)
        .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    assert(walk(q, e) === walk(q.repartition(5), e.repartition(7)))
  }

  test("lateInteractionRerank: hand-computed MaxSim scores and ranking") {
    val s = spark
    import s.implicits._
    // q = [1,2 | 3,4]; A = [1,0 | 0,2]; B = [2,2 | 1,1] (m=2, subDim=2)
    // maxsim(q,A) = max(1,4)+max(3,8) = 12 (×1e9)
    // maxsim(q,B) = max(6,3)+max(14,7) = 20 (×1e9) → B ranks first
    val q = Seq((100L, Seq(1f, 2f, 3f, 4f))).toDF("vec_id", "embedding")
    val c = Seq((1L, Seq(1f, 0f, 0f, 2f)), (2L, Seq(2f, 2f, 1f, 1f)))
      .toDF("vec_id", "embedding")
    val short = Seq((100L, 1L), (100L, 2L)).toDF("qid", "nid")
    val got = SimilaritySearch.lateInteractionRerank(q, c, short,
        "vec_id", "embedding", m = 2, subDim = 2, k = 2)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4).toSeq
    assert(got == Seq((100L, 2L, 20000000000L, 1), (100L, 1L, 12000000000L, 2)))
    // partition stability
    val again = SimilaritySearch.lateInteractionRerank(q.repartition(3),
        c.repartition(2), short.repartition(2),
        "vec_id", "embedding", 2, 2, 2)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4).toSeq
    assert(again == got)
  }

  test("knnGraphDescent: degree >= N-1 converges to the exact graph; " +
      "refinement is partition-stable") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(spark, sf001).limit(20)
    // degree 19 on 20 nodes: the bucket count collapses to 1, init is
    // the complete graph, and descent must return exactly knnGraph
    val full = SimilaritySearch.knnGraphDescent(e, "vec_id", "embedding",
      degree = 19, rounds = 1)
      .select("src", "nbr").as[(Long, Long)].collect().toSeq.sorted
    val exact = SimilaritySearch.knnGraph(e, "vec_id", "embedding", 19)
      .select("src", "nbr").as[(Long, Long)].collect().toSeq.sorted
    assert(full === exact, "complete-bucket descent must equal the exact graph")
    // sparse: bounded degree, deterministic under partitioning
    def run(cs: org.apache.spark.sql.DataFrame) =
      SimilaritySearch.knnGraphDescent(cs, "vec_id", "embedding", 4, 2)
        .select("src", "nbr", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    val a = run(e)
    assert(a === run(e.repartition(7)))
    assert(a.groupBy(_._1).values.forall(_.size <= 4))
    // descent graph plugs straight into the beam search
    val g = SimilaritySearch.knnGraphDescent(e, "vec_id", "embedding", 4, 2)
      .select("src", "nbr")
    val hits = SimilaritySearch.graphAnnTopK(e.filter($"vec_id" < 2), e,
      "vec_id", "embedding", g, k = 2, beam = 4, hops = 3)
    assert(hits.count() === 4)
    intercept[IllegalArgumentException](
      SimilaritySearch.knnGraphDescent(e, "vec_id", "embedding", 0, 1))
    intercept[IllegalArgumentException](
      SimilaritySearch.knnGraphDescent(e, "vec_id", "embedding", 4, 0))
  }

  test("sampleNegatives hash-slice path equals the naive global draw " +
      "and is partition-stable") {
    val s = spark
    import s.implicits._
    // corpus big enough that the 32-bit slice threshold actually cuts
    // (target ≈ 576 of N = 5000 → ~88% of candidate pairs never reach
    // the window) — the kept rows must still be bit-identical to the
    // naive unfiltered ranking
    val corpus = (0L until 5000L).map(i =>
      (i, Seq((i % 17).toFloat, (i % 31).toFloat, 1.0f))).toDF("vec_id", "embedding")
    val q = corpus.filter($"vec_id" < 5)
    val got = SimilaritySearch.sampleNegatives(
      q, corpus, "vec_id", "embedding", k = 3, excludeTopM = 2)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    val near = SimilaritySearch.bruteForceTopK(q, corpus, "vec_id", "embedding", 2)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val naive = (0L until 5L).flatMap { qi =>
      (0L until 5000L).filter(n => n != qi && !near((qi, n)))
        .map(n => (n, md5hex(s"$qi:$n")))
        .sortBy { case (n, d) => (d, n) }.take(3).zipWithIndex
        .map { case ((n, _), i) => (qi, n, i + 1) }
    }.sorted
    assert(got === naive, "slice-pruned draw must equal the global ranking")
    val again = SimilaritySearch.sampleNegatives(
      q.repartition(7), corpus.repartition(13), "vec_id", "embedding", 3, 2)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    assert(got === again, "draw must not depend on partitioning")
  }

  test("filteredTopK: selective filter takes the EXACT branch and equals brute force over survivors") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = e.filter($"vec_id" < 16)
    val index = SimilaritySearch.ivfAssign(e, cents, "vec_id", "embedding", "vec_id")
    val matching = e.filter($"vec_id" % 37 === 0).select("vec_id") // ~14 survivors
    val queries = e.filter($"vec_id" < 4)
    val got = SimilaritySearch.filteredTopK(queries, index, cents, matching,
      "vec_id", "embedding", "vec_id", k = 3, nProbe = 2, maxExactRows = 1000L)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    val exact = SimilaritySearch.bruteForceTopK(queries,
      e.join(matching, Seq("vec_id"), "left_semi"), "vec_id", "embedding", k = 3)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    assert(got === exact, "exact branch must be recall-perfect over the survivors")
    assert(got.nonEmpty)
  }

  test("filteredTopK: permissive filter takes the probe branch ≡ IVF over the filtered index; exact branch beats its recall") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = e.filter($"vec_id" < 16)
    val index = SimilaritySearch.ivfAssign(e, cents, "vec_id", "embedding", "vec_id")
    val matching = e.filter($"vec_id" % 2 === 0).select("vec_id")
    val queries = e.filter($"vec_id" < 4)
    def run(maxExact: Long) = SimilaritySearch.filteredTopK(queries, index,
      cents, matching, "vec_id", "embedding", "vec_id", k = 3, nProbe = 2,
      maxExactRows = maxExact)
    val probed = run(10L) // survivors ≫ 10 → probe branch
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    val viaIvf = SimilaritySearch.ivfTopKIndexed(queries,
      index.join(matching.withColumnRenamed("vec_id", "nid"), Seq("nid"), "left_semi"),
      cents, "vec_id", "embedding", "vec_id", k = 3, nProbe = 2)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    assert(probed === viaIvf, "probe branch = IVF over the pre-filtered index")
    // the same call with the gate wide open is exact — recall ≥ the probe's
    val exactSet = run(1000000L)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val overlap = probed.map(p => (p._1, p._2)).count(exactSet.contains)
    assert(overlap <= probed.size && exactSet.size == probed.size,
      "both branches return k rows per query")
  }
}
