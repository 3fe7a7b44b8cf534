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
}
