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
}
