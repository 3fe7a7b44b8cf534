package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  test("hashSample is a deterministic, repartition-invariant subset") {
    val s = spark
    import s.implicits._
    val df = (1L to 1000L).toDF("id")
    val a = Sampling.hashSample(df, "id", "20").as[Long].collect().sorted
    val b = Sampling.hashSample(df.repartition(7), "id", "20").as[Long].collect().sorted
    assert(a.toSeq === b.toSeq)
    // ~12.5% expected at threshold "20"; loose bounds, deterministic data
    assert(a.length > 60 && a.length < 200, s"got ${a.length}")
  }

  test("hashSample stays a pure filter — no shuffle in the plan") {
    val s = spark
    import s.implicits._
    val plan = Sampling.hashSample((1L to 10L).toDF("id"), "id", "20")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hash sample must not shuffle:\n$plan")
  }

  test("stratifiedSample returns exactly k per stratum in hash order") {
    val s = spark
    import s.implicits._
    val df = (1L to 300L).map(i => (if (i % 3 == 0) "x" else "y", i)).toDF("g", "id")
    val out = Sampling.stratifiedSample(df, "g", "id", 10)
    val byG = out.groupBy("g").agg(count(lit(1)).as("n"), max("rn").as("maxrn"))
      .as[(String, Long, Long)].collect().map { case (g, n, m) => g -> ((n, m)) }.toMap
    assert(byG("x") === ((10L, 10L)))
    assert(byG("y") === ((10L, 10L)))

    // matches the window-function formulation exactly
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(md5(col("id").cast("string")), col("id"))
    val exp = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select(col("g"), col("id"), col("rn").cast("long"))
      .as[(String, Long, Long)].collect().sorted
    val got = out.select("g", "id", "rn").as[(String, Long, Long)].collect().sorted
    assert(got.toSeq === exp.toSeq)
  }

  test("splitByHash labels are total, deterministic, and stable under corpus growth") {
    val s = spark
    import s.implicits._
    val splits = Seq("train" -> "e6", "val" -> "f3")
    val small = Sampling.splitByHash((1L to 500L).toDF("id"), "id", splits, "test")
      .as[(Long, String)].collect().toMap
    val grown = Sampling.splitByHash((1L to 1000L).toDF("id"), "id", splits, "test")
      .as[(Long, String)].collect().toMap
    // every original row keeps its split when the corpus doubles
    assert(small.forall { case (id, lab) => grown(id) == lab })
    // all three labels occur and roughly match the hash-space shares
    val counts = grown.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts("train") > 850 && counts("train") < 950, counts.toString)
  }

  test("splitByHash rejects unsorted thresholds") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException](Sampling.splitByHash(
      (1L to 10L).toDF("id"), "id", Seq("a" -> "f3", "b" -> "e6"), "c"))
  }

  test("hashSample rejects an uppercase threshold instead of silently keeping nothing") {
    val s = spark
    import s.implicits._
    val df = (1L to 10L).toDF("id")
    intercept[IllegalArgumentException](Sampling.hashSample(df, "id", "1A"))
  }

  test("stratifiedSample rejects a non-integral id column") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", "x1"), ("a", "x2")).toDF("g", "id")
    intercept[IllegalArgumentException](Sampling.stratifiedSample(df, "g", "id", 1))
  }

  test("weightedSample: deterministic, repartition-invariant, favors heavy items") {
    val s = spark
    import s.implicits._
    // half the ids weight 9, half weight 1 → a 40-draw sample should be
    // dominated by heavy items (expected ~36 of 40)
    val df = (1L to 200L).map(i => (i, if (i % 2 == 0) 9L else 1L)).toDF("id", "w")
    val a = Sampling.weightedSample(df, "id", "w", k = 40, wCap = 16)
      .select("id").as[Long].collect().sorted
    val b = Sampling.weightedSample(df.repartition(7), "id", "w", k = 40, wCap = 16)
      .select("id").as[Long].collect().sorted
    assert(a.toSeq === b.toSeq)
    assert(a.length === 40)
    val heavy = a.count(_ % 2 == 0)
    assert(heavy >= 28, s"heavy items should dominate, got $heavy/40")
  }

  test("weightedSample excludes zero-weight items and validates params") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 0L), (2L, 5L), (3L, 1L)).toDF("id", "w")
    val picked = Sampling.weightedSample(df, "id", "w", k = 10, wCap = 8)
      .select("id").as[Long].collect().toSet
    assert(picked === Set(2L, 3L)) // id 1 never draws
    intercept[IllegalArgumentException](Sampling.weightedSample(df, "id", "w", 0, 8))
    intercept[IllegalArgumentException](Sampling.weightedSample(df, "id", "w", 5, 0))
  }

  test("stratifiedSample with undersized stratum returns all its rows") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "id")
    val out = Sampling.stratifiedSample(df, "g", "id", 5)
      .groupBy("g").agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    assert(out === Map("a" -> 2L, "b" -> 1L))
  }

  test("splitByCluster: near-dup pairs NEVER straddle splits; singletons match doc-level split") {
    val s = spark
    import s.implicits._
    val docs = (1L to 300L).toDF("doc_id")
    // chains of near-dups: (1,2),(2,3) one cluster; (10,11); rest singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val out = Sampling.splitByCluster(docs, "doc_id", pairs, "a", "b",
      Seq("train" -> "80", "val" -> "c0"), "test")
    val m = out.select("doc_id", "rep", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // every clustered doc carries its component minimum and ONE split
    assert(Set(m(1L), m(2L), m(3L)).size == 1 && m(1L)._1 == 1L)
    assert(m(10L) == m(11L) && m(10L)._1 == 10L)
    // singletons: identical to the doc-level hash split
    val solo = Sampling.splitByHash(docs.filter($"doc_id" === 42L), "doc_id",
      Seq("train" -> "80", "val" -> "c0"), "test")
      .select("split").as[String].collect().head
    assert(m(42L) == ((42L, solo)))
    // all three labels actually occur on 300 docs at these thresholds
    assert(out.select("split").distinct().count() == 3)
  }

  test("mixtureSample flattens source shares toward √ and is deterministic") {
    val s = spark
    import s.implicits._
    // dominant source 900 docs, rare source 100: raw shares 90%/10%,
    // √-flattened masses 0.9487/0.3162 → quotas ~75%/25% of budget —
    // the rare source must be sampled at well ABOVE its raw share
    val df = ((1L to 900L).map(i => (i, "crawl")) ++
      (1001L to 1100L).map(i => (i, "books"))).toSeq.toDF("doc_id", "source")
    val out = Sampling.mixtureSample(df, "doc_id", "source", budget = 200L)
    val kept = out.filter(col("kept")).groupBy("source")
      .agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    val crawlRate = kept("crawl") / 900.0
    val booksRate = kept("books") / 100.0
    assert(booksRate > 2 * crawlRate,
      s"temperature must upweight the rare source: books=$booksRate crawl=$crawlRate")
    // allocation lands near the √-flattened quota (75/25 ± sampling noise)
    val total = kept.values.sum.toDouble
    assert(kept("books") / total > 0.15 && kept("books") / total < 0.4, kept.toString)
    // deterministic under repartitioning
    val again = Sampling.mixtureSample(df.repartition(7), "doc_id", "source", 200L)
      .filter(col("kept")).select("doc_id").as[Long].collect().sorted.toSeq
    val first = out.filter(col("kept")).select("doc_id").as[Long].collect().sorted.toSeq
    assert(first == again)
  }

  test("mixtureSampleT: T=2/1 is mixtureSample; quotas flatten MONOTONICALLY in T") {
    val s = spark
    import s.implicits._
    val df = ((1L to 900L).map(i => (i, "crawl")) ++
      (1001L to 1100L).map(i => (i, "books"))).toSeq.toDF("doc_id", "source")
    val a = Sampling.mixtureSample(df, "doc_id", "source", 200L)
    val b = Sampling.mixtureSampleT(df, "doc_id", "source", 200L, tNum = 2, tDen = 1)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
    // the rare source's share of total mass Z strictly grows with T:
    // T = 1 (raw shares) < 3/2 < 2 < 3
    def booksShare(tn: Int, td: Int): Double = {
      val w = Sampling.mixtureSampleT(df, "doc_id", "source", 200L, tn, td)
        .select("source", "w_s").distinct()
        .as[(String, Long)].collect().toMap
      w("books").toDouble / (w("books") + w("crawl"))
    }
    val shares = Seq(booksShare(1, 1), booksShare(3, 2), booksShare(2, 1), booksShare(3, 1))
    assert(shares == shares.sorted && shares.distinct == shares,
      s"rare-source mass share must strictly increase with T, got $shares")
    assert(math.abs(shares.head - 0.1) < 1e-9, "T=1 must reproduce raw shares")
  }

  test("mixtureSampleT: integer roots are EXACT on known powers") {
    val s = spark
    import s.implicits._
    // single source → share = 1e12 exactly; w_s = (1e12·tDen-power)^(1/tNum)
    val df = (1L to 10L).map(i => (i, "only")).toSeq.toDF("doc_id", "source")
    def wOf(tn: Int, td: Int): Long =
      Sampling.mixtureSampleT(df, "doc_id", "source", 5L, tn, td)
        .select("w_s").distinct().as[Long].collect().head
    assert(wOf(3, 1) == 10000L)          // cbrt(1e12)
    assert(wOf(3, 2) == 100000000L)      // (1e24)^(1/3)
    assert(wOf(2, 1) == 1000000L)        // sqrt(1e12)
    assert(wOf(1, 1) == 1000000000000L)  // identity root
    intercept[IllegalArgumentException]( // T < 1 (sharpening) out of contract
      Sampling.mixtureSampleT(df, "doc_id", "source", 5L, 1, 2))
  }

  test("mixtureSample: a giant source past the old Int64 share domain gets exact quotas") {
    val s = spark
    import s.implicits._
    // n_s·10¹² overflows Int64 once n_s > ~9.2e6 — the normal case for a
    // dominant crawl source; the decimal path must stay exact (the old
    // arithmetic silently produced a null w_s here)
    val big = s.range(9300000L).select(col("id").as("doc_id"), lit("crawl").as("source"))
    val small = s.range(9300000L, 9300010L)
      .select(col("id").as("doc_id"), lit("books").as("source"))
    val w = Sampling.mixtureSample(big.union(small), "doc_id", "source", 1000L)
      .select("source", "w_s").distinct().as[(String, Long)].collect().toMap
    def isqrt(x: BigInt): Long = {
      var r = BigInt(math.sqrt(x.toDouble).toLong + 2)
      while (r * r > x) r -= 1
      r.toLong
    }
    val nTot = BigInt(9300010L)
    val wCrawl = isqrt(BigInt(9300000L) * BigInt("1000000000000") / nTot)
    val wBooks = isqrt(BigInt(10L) * BigInt("1000000000000") / nTot)
    assert(w("crawl") == wCrawl && w("books") == wBooks)

    // thr-product regression (ADVICE r4 high): budget·w_s·2²⁸ =
    // 1e6·~1e6·2.68e8 ≈ 2.7e20 ≫ 2⁶³ — the old Int64 product wrapped
    // negative, hex'd to 16 f's, lpad-truncated to 'fffffff', and kept
    // ~EVERYTHING. The decimal threshold is exact: the crawl draw must
    // be selective at ≈ budget·w_s/Z ≈ 999k of 9.3M, not all 9.3M.
    val kept = Sampling.mixtureSample(big.union(small), "doc_id", "source", 1000000L)
      .filter(col("kept")).groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val z = wCrawl + wBooks
    val thrCrawl = (BigInt(1000000L) * wCrawl * 268435456L) / (BigInt(z) * 9300000L)
    val expCrawl = 9300000L * thrCrawl.toDouble / 268435456.0
    assert(kept("books") == 10L, "tiny source's thr >= 2^28 keeps all of it")
    assert(math.abs(kept("crawl") - expCrawl) < 5000,
      s"crawl draw must be selective and exact-quota: got ${kept("crawl")}, expected ~$expCrawl")
  }

  test("mixtureSample: a threshold at/above 2^28 keeps every doc of that source") {
    val s = spark
    import s.implicits._
    // one source, budget ≥ population → quota threshold ≥ 2^28 → keep all
    val df = (1L to 50L).map(i => (i, "only")).toSeq.toDF("doc_id", "source")
    val out = Sampling.mixtureSample(df, "doc_id", "source", budget = 1000L)
    assert(out.filter(col("kept")).count() == 50L)
    intercept[IllegalArgumentException](
      Sampling.mixtureSample(df, "doc_id", "source", 0L))
  }

  test("capPerCluster keeps exactly min(m, size) per cluster; singletons survive") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L), // cluster of 4
      (5L, 200L), (6L, 200L),                          // cluster of 2
      (7L, 300L)).toDF("id", "cluster")                // singleton
    val out = Sampling.capPerCluster(df, "id", "cluster", m = 2)
      .select("id", "cluster", "pick_rank", "kept")
      .as[(Long, Long, Int, Boolean)].collect().toSeq
    val kept = out.filter(_._4).groupBy(_._2).view.mapValues(_.size).toMap
    assert(kept === Map(100L -> 2, 200L -> 2, 300L -> 1))
    // ranks are a permutation of 1..size within each cluster
    assert(out.filter(_._2 == 100L).map(_._3).sorted === Seq(1, 2, 3, 4))
    // deterministic across reruns and partitionings
    val again = Sampling.capPerCluster(df.repartition(5), "id", "cluster", 2)
      .select("id", "kept").as[(Long, Boolean)].collect().toMap
    assert(out.map(r => r._1 -> r._4).toMap === again)
    intercept[IllegalArgumentException](Sampling.capPerCluster(df, "id", "cluster", 0))
  }

  test("keepBestPerCluster keeps the highest score, id tie-break, singletons survive") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, 100L, 10L), (2L, 100L, 30L), (3L, 100L, 30L), // tie at 30 → id 2 wins
      (4L, 200L, 5L)).toDF("id", "cluster", "score")
    val kept = Sampling.keepBestPerCluster(df, "id", "cluster", "score", m = 1)
      .filter(col("kept")).select("id").as[Long].collect().toSet
    assert(kept === Set(2L, 4L))
    intercept[IllegalArgumentException](
      Sampling.keepBestPerCluster(df, "id", "cluster", "score", 0))
  }

  test("epochedMixture: caps bind, budget is never exceeded, repetition happens, " +
      "and the plan is partition-stable") {
    val s = spark
    import s.implicits._
    // skewed corpus: a rare source (5 docs) and a dominant one (95)
    val df = ((0L until 5L).map(i => (i, "rare")) ++
      (100L until 195L).map(i => (i, "big"))).toDF("id", "src")
    val out = Sampling.epochedMixture(df, "id", "src",
      budget = 150L, maxEpochs = 4)
    val perSrc = out.groupBy("src")
      .agg(count(lit(1)).as("rows"), max("epoch").as("max_e"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // the T=2 flattened ask for 'rare' exceeds 5·4 — it must be capped
    // at exactly its 20-doc ceiling (full epochs of a capped source are
    // exact, no fractional draw)
    assert(perSrc("rare")._1 == 20L, s"rare source must serve its cap, got $perSrc")
    assert(perSrc("rare")._2 == 4L)
    assert(perSrc("big")._2 >= 1L)
    // served plan never exceeds budget or caps
    val served = out.select("src", "served_s").distinct()
      .as[(String, Long)].collect().toMap
    assert(served.values.sum <= 150L)
    assert(served("rare") == 20L && served("big") <= 95L * 4)
    // repetition: the whole point of the data-constrained regime
    assert(out.filter($"epoch" >= 2).count() > 0)
    // deterministic under partitioning
    val again = Sampling.epochedMixture(df.repartition(7), "id", "src", 150L, 4)
      .select("id", "src", "epoch").as[(Long, String, Long)].collect().toSeq.sorted
    assert(again === out.select("id", "src", "epoch")
      .as[(Long, String, Long)].collect().toSeq.sorted)
    intercept[IllegalArgumentException](
      Sampling.epochedMixture(df, "id", "src", 0L, 3))
    intercept[IllegalArgumentException](
      Sampling.epochedMixture(df, "id", "src", 10L, 0))
  }

  test("epochedMixtureBy: weight mass, not doc count, drives the plan") {
    val s = spark
    import s.implicits._
    // 'heavy': 2 docs of 500 units; 'light': 10 docs of 1 unit
    val df = (Seq((1L, "heavy", 500L), (2L, "heavy", 500L)) ++
      (10L until 20L).map(i => (i, "light", 1L))).toDF("id", "src", "w")
    val out = Sampling.epochedMixtureBy(df, "id", "src", col("w"),
      budget = 1030L, maxEpochs = 2)
    val plan = out.select("src", "n_s", "served_s").distinct()
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(plan("heavy")._1 == 1000L && plan("light")._1 == 10L,
      s"masses must be weight sums, got $plan")
    // light's flattened ask blows past its 20-unit cap → capped exactly
    assert(plan("light")._2 == 20L, s"light must cap at 2 epochs, got $plan")
    assert(plan("heavy")._2 <= 2000L)
    assert(out.filter($"src" === "light" && $"epoch" === 2).count() == 10,
      "a capped source serves every doc in every epoch")
  }

  test("epochedMixtureBy rejects a source with non-positive weight mass") {
    val s = spark
    import s.implicits._
    // 'dead' sums to 0 — would divide by zero in the waterfill plan
    val df = Seq((1L, "live", 10L), (2L, "dead", 0L)).toDF("id", "src", "w")
    val e = intercept[IllegalArgumentException](
      Sampling.epochedMixtureBy(df, "id", "src", col("w"),
        budget = 5L, maxEpochs = 1))
    assert(e.getMessage.contains("dead"))
    // negative weights pulling a source's sum below zero fail the same way
    val neg = Seq((1L, "a", 5L), (2L, "a", -9L)).toDF("id", "src", "w")
    intercept[IllegalArgumentException](
      Sampling.epochedMixtureBy(neg, "id", "src", col("w"),
        budget = 5L, maxEpochs = 1))
  }

  test("domainReweight: harder domains gain share monotonically, equal losses stay uniform") {
    val s = spark
    import s.implicits._
    val loss = Seq(("hard", 2000L), ("easy", 1000L), ("mid", 1500L))
      .toDF("src", "loss")
    val out = Sampling.domainReweight(loss, "src", "loss", rounds = 4,
        etaMilli = 1000)
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2).map(_._4).toSeq }
    // the hardest domain's share strictly grows, the easiest strictly
    // shrinks; each round's weights sum to ~1e6 (floor rounding)
    assert(out("hard") == out("hard").sorted &&
      out("hard").distinct.size == 4, s"hard must grow: ${out("hard")}")
    assert(out("easy") == out("easy").sorted.reverse &&
      out("easy").distinct.size == 4, s"easy must shrink: ${out("easy")}")
    (0 until 4).foreach { r =>
      val tot = out.values.map(_(r)).sum
      assert(tot > 999990L && tot <= 1000000L, s"round $r total $tot")
    }
    // equal losses: excess is 0 everywhere, weights stay exactly uniform
    val eq = Sampling.domainReweight(
      Seq(("a", 700L), ("b", 700L)).toDF("src", "loss"), "src", "loss", 3, 500)
      .as[(String, Long, Long, Long)].collect()
    assert(eq.forall(_._4 == 500000L), eq.mkString(","))
    // validation
    intercept[IllegalArgumentException](Sampling.domainReweight(
      Seq(("a", -1L)).toDF("src", "loss"), "src", "loss", 1, 500))
    intercept[IllegalArgumentException](Sampling.domainReweight(
      loss, "src", "loss", 0, 500))
    intercept[IllegalArgumentException](Sampling.domainReweight(
      loss, "src", "loss", 1, 0))
  }

  test("dsirScores ranks target-like docs above pool-like docs; partition-stable") {
    val s = spark
    import s.implicits._
    // target speaks alpha/beta; the raw pool is half target-like, half
    // gamma/delta boilerplate — DSIR must separate them cleanly
    val target = (100L until 110L).map(i => (i, "alpha beta alpha beta"))
      .toDF("doc_id", "text")
    val raw = ((0L until 5L).map(i => (i, "alpha beta alpha")) ++
      (10L until 15L).map(i => (i, "gamma delta gamma")) :+
      ((20L, "")) // zero tokens → no features → absent from scores
      ).toDF("doc_id", "text")
    val scored = Sampling.dsirScores(raw, target, "doc_id", "text", buckets = 256)
      .as[(Long, Long, Long)].collect()
      .map { case (id, mb, nf) => id -> ((mb, nf)) }.toMap
    assert(!scored.contains(20L), "token-free docs carry no evidence")
    val alphaMin = (0L until 5L).map(i => scored(i)._1).min
    val gammaMax = (10L until 15L).map(i => scored(i)._1).max
    assert(alphaMin > gammaMax,
      s"every target-like doc must outscore every pool-like doc ($scored)")
    // selection: exactly k, ranked, and the winners are the target-like docs
    val sel = Sampling.dsirSelect(raw, target, "doc_id", "text", 256, k = 5)
      .select("doc_id", "rank").as[(Long, Int)].collect().toSeq
    assert(sel.map(_._1).toSet == (0L until 5L).toSet)
    assert(sel.map(_._2).sorted == Seq(1, 2, 3, 4, 5))
    // determinism under partitioning
    val again = Sampling.dsirScores(raw.repartition(7), target.repartition(3),
      "doc_id", "text", 256).as[(Long, Long, Long)].collect()
      .map { case (id, mb, nf) => id -> ((mb, nf)) }.toMap
    assert(again == scored)
    intercept[IllegalArgumentException](
      Sampling.dsirScores(raw, target, "doc_id", "text", 1))
  }
}
