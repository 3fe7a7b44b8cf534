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
