package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ContaminationSpec extends SparkSpec {

  test("ngramOverlap flags exactly the docs sharing an n-gram with the benchmark") {
    val s = spark
    import s.implicits._
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta zeta"), // shares "alpha beta gamma delta"
      (2L, "one two three four five"),     // clean
      (3L, "too short")                    // < 4 words: no shingles, absent
    ).toDF("id", "text")
    val out = Contamination.ngramOverlap(corpus, bench, "id", "text", n = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) === ((2L, 1L, true)))
    assert(out(2L) === ((2L, 0L, false)))
    assert(!out.contains(3L))
  }

  test("benchmark probe is a broadcast join — the corpus is never shuffled for it") {
    val s = spark
    import s.implicits._
    val bench = Seq((100L, "a b c d")).toDF("id", "text")
    val corpus = Seq((1L, "a b c d e")).toDF("id", "text")
    val plan = Contamination.ngramOverlap(corpus, bench, "id", "text", 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe:\n$plan")
  }

  test("fuzzyOverlap catches a truncated near-dup exact probes would score low") {
    val s = spark
    import s.implicits._
    val words = (1 to 20).map(i => s"w$i")
    val corpus = Seq(
      (1L, words.mkString(" ")),                  // full doc: 17 4-gram shingles
      (2L, "totally different text here five six seven eight")
    ).toDF("id", "text")
    // bench item = first 16 of the 20 words: 13 of the 17 shingles
    val bench = Seq((9L, words.take(16).mkString(" "))).toDF("id", "text")
    val out = Contamination.fuzzyOverlap(corpus, bench, "id", "text",
        n = 4, k = 12, rowsPerBand = 3, num = 7, den = 10)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    // jaccard = 13 / (17 + 13 - 13) = 13/17 ≈ 0.765 ≥ 0.7, and a 13/17
    // subset always shares the global minhash with prob; with 4 bands of
    // 3 at J≈0.76 collision prob ≈ 0.97 — this fixture collides (pinned)
    assert(out == Seq((1L, 9L, 13L, 17L, 13L, 13.0 / 17.0)))
  }

  test("fuzzyOverlap verify kills band collisions below the threshold") {
    val s = spark
    import s.implicits._
    // same first 4 words → the two sides share exactly ONE shingle; if
    // any band collides, exact verification must still reject the pair
    val corpus = Seq((1L, "a b c d e f g h i j")).toDF("id", "text")
    val bench = Seq((9L, "a b c d zz yy xx ww")).toDF("id", "text")
    val out = Contamination.fuzzyOverlap(corpus, bench, "id", "text",
      n = 4, k = 12, rowsPerBand = 3, num = 7, den = 10).collect()
    assert(out.isEmpty)
  }

  test("semanticOverlap finds identity leaks at sim 1.0 and respects the threshold") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, Seq(1f, 0f)),
      (2L, Seq(0f, 1f)),
      (3L, Seq(0.9f, 0.1f))).toDF("id", "vec")
    val cent = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f))).toDF("id", "vec")
    val bench = Seq((9L, Seq(1f, 0f))).toDF("id", "vec")
    val out = Contamination.semanticOverlap(corpus, bench, "id", "vec",
        cent, "id", "vec", simThreshold = 0.95, nProbe = 1)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    // the leaked item (id 1, identical) surfaces at sim ≈ 1.0 (the
    // fixed-point dot over √n2·√n2 is within one ulp of 1, identically
    // in every engine); id 3 (cos ≈ 0.994) passes; id 2 is in the
    // other cell
    assert(out.map(p => (p._1, p._2)) == Seq((1L, 9L), (3L, 9L)))
    assert(math.abs(out.head._3 - 1.0) < 1e-12 && out(1)._3 > 0.95 && out(1)._3 < 0.999)
  }

  test("semanticOverlap multi-probe recovers matches across the bench item's cell boundary") {
    val s = spark
    import s.implicits._
    // bench (0.8, 0.6) assigns to cell 0, but its 0.96-cosine neighbor
    // (0.6, 0.8) lives in cell 1 — reachable only via the second probe
    val corpus = Seq((1L, Seq(1f, 0f)), (2L, Seq(0.6f, 0.8f))).toDF("id", "vec")
    val cent = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f))).toDF("id", "vec")
    val bench = Seq((9L, Seq(0.8f, 0.6f))).toDF("id", "vec")
    def run(nProbe: Int) = Contamination.semanticOverlap(corpus, bench, "id", "vec",
        cent, "id", "vec", simThreshold = 0.9, nProbe = nProbe)
      .as[(Long, Long, Double)].collect().toSeq
    assert(run(1).isEmpty)
    val two = run(2)
    assert(two.map(p => (p._1, p._2)) == Seq((2L, 9L)) && math.abs(two.head._3 - 0.96) < 1e-6)
  }

  test("fuzzyOverlap is deterministic under repartitioning") {
    val s = spark
    import s.implicits._
    val words = (1 to 30).map(i => s"t$i")
    val corpus = (1L to 6L).map(i =>
      (i, words.drop(i.toInt % 3).mkString(" "))).toDF("id", "text")
    val bench = Seq((99L, words.take(24).mkString(" "))).toDF("id", "text")
    def run(c: org.apache.spark.sql.DataFrame) =
      Contamination.fuzzyOverlap(c, bench, "id", "text",
          n = 4, k = 12, rowsPerBand = 3, num = 5, den = 10)
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq.sorted
    assert(run(corpus) == run(corpus.repartition(7)))
  }
}
