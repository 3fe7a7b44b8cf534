package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {

  test("hllEstimate lands within ~5% of a 10k true cardinality at b=10") {
    val s = spark
    import s.implicits._
    val df = (1L to 10000L).toDF("id")
    val (mUsed, _, est) = Sketches.hllEstimate(Sketches.hllState(df, "id", 10), 10)
      .as[(Long, Long, Double)].collect().head
    assert(mUsed <= 1024L)
    assert(math.abs(est - 10000.0) / 10000.0 < 0.05, s"estimate $est")
  }

  test("hllMerge of disjoint slices equals the state of the union") {
    val s = spark
    import s.implicits._
    val a = (1L to 4000L).toDF("id")
    val b = (3000L to 8000L).toDF("id") // overlapping on purpose
    val merged = Sketches.hllMerge(Seq(
      Sketches.hllState(a, "id", 8), Sketches.hllState(b, "id", 8)))
      .as[(Long, Int)].collect().sorted
    val direct = Sketches.hllState(a.unionByName(b), "id", 8)
      .as[(Long, Int)].collect().sorted
    assert(merged.toSeq === direct.toSeq)
  }

  test("hll state is bounded by m rows and insensitive to duplicates") {
    val s = spark
    import s.implicits._
    val once = Sketches.hllState((1L to 500L).toDF("id"), "id", 6)
    val tripled = Sketches.hllState(
      ((1L to 500L) ++ (1L to 500L) ++ (1L to 500L)).toDF("id"), "id", 6)
    assert(once.count() <= 64L)
    assert(once.as[(Long, Int)].collect().sorted.toSeq ===
      tripled.as[(Long, Int)].collect().sorted.toSeq)
  }

  test("cms estimates are admissible upper bounds and exact without collisions") {
    val s = spark
    import s.implicits._
    // 50 keys with frequency = key, w=1024 → essentially collision-free
    val rows = (1L to 50L).flatMap(k => Seq.fill(k.toInt)(k)).toDF("k")
    val st = Sketches.cmsState(rows, "k", d = 4, w = 1024)
    val est = Sketches.cmsLookup(st, (1L to 50L).toDF("k"), "k", 4, 1024)
      .as[(Long, Long)].collect().toMap
    (1L to 50L).foreach(k => assert(est(k) === k, s"key $k"))
  }

  test("cms never underestimates under forced collisions") {
    val s = spark
    import s.implicits._
    val rows = (1L to 200L).flatMap(k => Seq.fill(3)(k)).toDF("k")
    val st = Sketches.cmsState(rows, "k", d = 2, w = 16) // heavy collisions
    val est = Sketches.cmsLookup(st, (1L to 200L).toDF("k"), "k", 2, 16)
      .as[(Long, Long)].collect().toMap
    (1L to 200L).foreach(k => assert(est(k) >= 3L, s"key $k underestimated"))
  }

  test("histogram quantiles: known ranks land on bucket lower edges") {
    val s = spark
    import s.implicits._
    // values 1..100, 10 buckets of width 10: rank ceil(0.5·100)=50 first
    // reaches cumulative ≥50 in bucket 5 (cum 9,19,…,49,59) → edge 50.0
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val st = Sketches.histogramState(df, "v", 0.0, 100.0, 10)
    val out = Sketches.histogramQuantile(st, 0.0, 100.0, 10, Seq(0.5, 0.99))
      .as[(Double, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out(0.5) === ((5L, 50.0)))
    assert(out(0.99) === ((9L, 90.0))) // rank 99 lands in the top bucket
  }

  test("histogram state clamps out-of-range values to edge buckets and merges exactly") {
    val s = spark
    import s.implicits._
    val a = Seq(-5.0, 1.0, 2.0).toDF("v")
    val b = Seq(99.0, 250.0).toDF("v") // 250 clamps to bucket 9
    val merged = Sketches.histogramMerge(Seq(
      Sketches.histogramState(a, "v", 0.0, 100.0, 10),
      Sketches.histogramState(b, "v", 0.0, 100.0, 10)))
      .as[(Long, Long)].collect().toMap
    val direct = Sketches.histogramState(a.unionByName(b), "v", 0.0, 100.0, 10)
      .as[(Long, Long)].collect().toMap
    assert(merged === direct)
    assert(merged(0L) === 3L) // -5 clamped down, plus 1 and 2
    assert(merged(9L) === 2L) // 99 natural + 250 clamped up
  }

  test("histogram rejects degenerate ranges and quantiles") {
    val s = spark
    import s.implicits._
    val df = Seq(1.0).toDF("v")
    intercept[IllegalArgumentException](Sketches.histogramState(df, "v", 5.0, 5.0, 10))
    intercept[IllegalArgumentException](Sketches.histogramQuantile(
      Sketches.histogramState(df, "v", 0.0, 1.0, 4), 0.0, 1.0, 4, Seq(1.5)))
  }

  test("hllIntersect recovers a known overlap within raw-HLL error") {
    val s = spark
    import s.implicits._
    // |A|=6000, |B|=6000, |A∩B|=2000 (ids 4001..6000 shared)
    val a = (1L to 6000L).toDF("id")
    val b = (4001L to 10000L).toDF("id")
    val r = Sketches.hllIntersect(a, b, "id", bits = 10)
      .select("est_a", "est_b", "est_union", "est_intersect")
      .as[(Double, Double, Double, Double)].collect().head
    assert(math.abs(r._1 - 6000) / 6000 < 0.06, s"est_a ${r._1}")
    assert(math.abs(r._2 - 6000) / 6000 < 0.06, s"est_b ${r._2}")
    assert(math.abs(r._3 - 10000) / 10000 < 0.06, s"est_union ${r._3}")
    // intersection compounds three raw estimates' error — wider band
    assert(math.abs(r._4 - 2000) / 2000 < 0.25, s"est_intersect ${r._4}")
  }

  test("hllIntersect on disjoint corpora estimates ~0 overlap") {
    val s = spark
    import s.implicits._
    val r = Sketches.hllIntersect(
      (1L to 5000L).toDF("id"), (100001L to 105000L).toDF("id"), "id", 10)
      .select("est_union", "est_intersect")
      .as[(Double, Double)].collect().head
    // |est_intersect| small relative to the union (may be negative)
    assert(math.abs(r._2) / r._1 < 0.1, s"intersect ${r._2} vs union ${r._1}")
  }

  test("heavyHitters returns exact counts and survives forced collisions") {
    val s = spark
    import s.implicits._
    // freq(k) = k for k = 1..40; w=8 forces heavy collisions
    val rows = (1L to 40L).flatMap(k => Seq.fill(k.toInt)(k)).toDF("k")
    val got = Sketches.heavyHitters(rows, "k", d = 3, w = 8, minCount = 30L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // exact, no false positives/negatives: exactly keys 30..40, true counts
    assert(got.map(r => r._1 -> r._3).toMap === (30L to 40L).map(k => k -> k).toMap)
    // screen estimates are admissible upper bounds
    assert(got.forall(r => r._2 >= r._3))
  }

  test("heavyHitters with a roomy sketch reports est == exact") {
    val s = spark
    import s.implicits._
    val rows = (1L to 20L).flatMap(k => Seq.fill(if (k <= 2) 50 else 1)(k)).toDF("k")
    val got = Sketches.heavyHitters(rows, "k", d = 4, w = 1024, minCount = 10L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 50L, 50L), (2L, 50L, 50L)))
  }

  test("hllStateBy: per-group estimates track per-group truth; merge == union state") {
    val s = spark
    import s.implicits._
    // group a: 2000 distinct keys, group b: 200 — estimates must track
    // each group's OWN cardinality
    // both groups above the raw estimator's ~2.5·m validity floor
    val df = ((1L to 8000L).map(i => ("a", i)) ++
      (1L to 3000L).map(i => ("b", i + 100000L))).toDF("g", "k")
    val est = Sketches.hllEstimateBy(Sketches.hllStateBy(df, "g", "k", b = 10), b = 10)
      .select("grp", "est_distinct").as[(String, Double)].collect().toMap
    assert(math.abs(est("a") - 8000) / 8000.0 < 0.10, s"a: ${est("a")}")
    assert(math.abs(est("b") - 3000) / 3000.0 < 0.15, s"b: ${est("b")}")
    // merging two half-states equals the state of the union (max is
    // associative — EXACT, not approximate)
    val h1 = Sketches.hllStateBy(df.filter($"k" % 2 === 0), "g", "k", 10)
    val h2 = Sketches.hllStateBy(df.filter($"k" % 2 === 1), "g", "k", 10)
    val merged = Sketches.hllMergeBy(Seq(h1, h2))
      .as[(String, Long, Int)].collect().toSet
    val whole = Sketches.hllStateBy(df, "g", "k", 10)
      .as[(String, Long, Int)].collect().toSet
    assert(merged === whole)
  }

  test("cms state is bounded by d·w cells") {
    val s = spark
    import s.implicits._
    val st = Sketches.cmsState((1L to 5000L).toDF("k"), "k", d = 3, w = 32)
    assert(st.count() <= 96L)
    // cell-wise totals: each of the d rows sees every input once
    val perRow = st.groupBy("r").agg(sum("cnt").as("n"))
      .as[(Int, Long)].collect().toMap
    assert(perRow.values.toSet === Set(5000L))
  }
}
