package graft.operators

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profile: hand-computed stats incl. nulls, modal tie-break, distinct") {
    val df = Seq(
      (Some("a"), Some(1L)), (Some("b"), Some(2L)), (Some("a"), None),
      (None, Some(2L)), (Some("c"), Some(10L))
    ).toDF("s", "n")
    val out = Profiler.profile(df, Seq("s", "n")).collect()
      .map(r => r.getString(0) -> r).toMap
    val s = out("s")
    assert(s.getAs[Long]("n_rows") == 5L && s.getAs[Long]("n_nulls") == 1L)
    assert(s.getAs[Long]("n_distinct") == 3L)
    assert(s.getAs[String]("min_v") == "a" && s.getAs[String]("max_v") == "c")
    assert(s.getAs[String]("top_v") == "a" && s.getAs[Long]("top_n") == 2L)
    val n = out("n")
    assert(n.getAs[Long]("n_nulls") == 1L && n.getAs[Long]("n_distinct") == 3L)
    // string rendering: "10" sorts before "2" lexicographically
    assert(n.getAs[String]("min_v") == "1" && n.getAs[String]("max_v") == "2")
    assert(n.getAs[String]("top_v") == "2")
  }

  test("profile: modal ties break to the smallest value; unknown column rejected") {
    val df = Seq("x", "y", "x", "y").toDF("c")
    val r = Profiler.profile(df, Seq("c")).collect()(0)
    assert(r.getAs[String]("top_v") == "x" && r.getAs[Long]("top_n") == 2L)
    intercept[IllegalArgumentException](Profiler.profile(df, Seq("nope")))
  }

  test("quantiles: type-1 semantics on ties and nulls, hand-checked, partition-stable") {
    val s = spark
    import s.implicits._
    // a: 1,1,1,2,10 (n=5) → p500 needs cum ≥ 2.5 → first value with
    // cum ≥ 3 is 1; p800 needs cum ≥ 4 → 2; p1000 → 10. b has nulls
    // (dropped from both n and cum): 5,7 → p500 → 5.
    val df = Seq(
      (Some(1.0), Some(5.0)), (Some(1.0), None), (Some(1.0), Some(7.0)),
      (Some(2.0), None), (Some(10.0), None)).toDF("a", "b")
    val got = Profiler.quantiles(df, Seq("a", "b"), Seq(500, 800, 1000))
      .as[(String, Long, Double)].collect().toSet
    assert(got === Set(
      ("a", 500L, 1.0), ("a", 800L, 2.0), ("a", 1000L, 10.0),
      ("b", 500L, 5.0), ("b", 800L, 7.0), ("b", 1000L, 7.0)))
    val again = Profiler.quantiles(df.repartition(5), Seq("a", "b"),
      Seq(500, 800, 1000)).as[(String, Long, Double)].collect().toSet
    assert(again === got)
    intercept[IllegalArgumentException](Profiler.quantiles(df, Seq("a"), Seq(0)))
    intercept[IllegalArgumentException](Profiler.quantiles(df, Seq("a"), Nil))
  }
}
