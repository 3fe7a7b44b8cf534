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

  private def expectedQ(vals: Seq[Double], qs: Seq[Int]): Map[Long, Double] = {
    val sorted = vals.sorted
    val n = sorted.size.toLong
    qs.map { q =>
      // smallest value whose cumulative count satisfies cum*1000 >= q*n
      val idx = sorted.indices.find(i => (i + 1L) * 1000 >= q * n).get
      q.toLong -> sorted(idx)
    }.toMap
  }

  test("quantiles: continuous high-cardinality column matches brute force; few buckets too") {
    val s = spark
    import s.implicits._
    // 10k DISTINCT doubles in shuffled order — the regime where the old
    // per-column single-partition window sorted the whole column in one
    // task; correctness must hold at any bucket count
    val vals = (1 to 10000).map(i => (i * 2654435761L % 10007) + i / 10000.0)
    val df = vals.toDF("x")
    val qs = Seq(1, 250, 500, 900, 990, 1000)
    val exp = expectedQ(vals, qs)
    for (b <- Seq(1, 7, 4096)) {
      val got = Profiler.quantiles(df, Seq("x"), qs, buckets = b)
        .as[(String, Long, Double)].collect()
        .map { case (_, q, v) => q -> v }.toMap
      assert(got === exp, s"buckets=$b")
    }
  }

  test("quantiles: skewed range (outlier crowds one bucket) and ties across bucket edges") {
    val s = spark
    import s.implicits._
    // nearly all mass in [0,1] plus a 1e9 outlier: equi-width buckets
    // degrade to one hot bucket — must stay CORRECT regardless
    val skew = (1 to 999).map(_ / 1000.0) :+ 1e9
    val qs = Seq(500, 999, 1000)
    val got = Profiler.quantiles(skew.toDF("x"), Seq("x"), qs, buckets = 64)
      .as[(String, Long, Double)].collect().map { case (_, q, v) => q -> v }.toMap
    assert(got === expectedQ(skew, qs))
    // heavy ties: value repeated enough that a target rank lands mid-run
    val ties = Seq.fill(50)(1.0) ++ Seq.fill(50)(2.0) ++ Seq.fill(50)(3.0)
    val got2 = Profiler.quantiles(ties.toDF("x"), Seq("x"), Seq(333, 334, 667, 1000),
        buckets = 2)
      .as[(String, Long, Double)].collect().map { case (_, q, v) => q -> v }.toMap
    assert(got2 === expectedQ(ties, Seq(333, 334, 667, 1000)))
  }

  test("quantiles plan: no per-column window over the value table (two-phase shape)") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val plan = Profiler.quantiles(df, Seq("x"), Seq(500))
      .queryExecution.executedPlan.toString
    // the trap shape: a window partitioned ONLY by col_name and ordered
    // by the raw value — that sorts a column's whole distinct set in one
    // task; the fixed plan orders col_name-partitions by BUCKET and
    // value-windows are co-partitioned by (col_name, bk)
    assert(!"windowspecdefinition\\(col_name#\\d+, v#".r.findFirstIn(plan).isDefined,
      "found a per-column window ordered by raw value:\n" + plan)
    assert("windowspecdefinition\\(col_name#\\d+, bk#\\d+L, v#\\d+".r
      .findFirstIn(plan).isDefined, "missing the (col_name, bk) value window:\n" + plan)
  }

  test("profile plan: modal value via aggregate, no window at all") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => (i % 7).toString).toDF("x")
    val plan = Profiler.profile(df, Seq("x")).queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition"),
      "profile must not plan any window:\n" + plan)
  }

  test("distributionDrift: identical snapshots score zero; a shift scores > 0 on the shifted column only") {
    val s = spark; import s.implicits._
    val ref = (1 to 200).map(i => (i.toLong % 50, (i % 7).toLong))
      .toDF("a", "b")
    val sameDrift = Profiler.distributionDrift(ref, ref, Seq("a", "b"), 10)
      .agg(org.apache.spark.sql.functions.sum("contrib")).as[Long].collect().head
    assert(sameDrift === 0L, "identical distributions must have zero PSI")
    // shift column a hard; leave b identical
    val cur = ref.withColumn("a",
      org.apache.spark.sql.functions.col("a") + 40L)
    val drift = Profiler.distributionDrift(ref, cur, Seq("a", "b"), 10)
      .groupBy("col_name")
      .agg(org.apache.spark.sql.functions.sum("contrib").as("psi"))
      .as[(String, Long)].collect().toMap
    assert(drift("a") > 0L, s"shifted column must drift: $drift")
    assert(drift("b") === 0L, s"unshifted column must not: $drift")
    assert(drift("a") > 100000L, s"a hard shift should be loud: $drift")
  }

  test("distributionDrift: out-of-range current values clamp into edge buckets; partitioning-invariant") {
    val s = spark; import s.implicits._
    val ref = (0 to 99).map(i => Tuple1(i.toLong)).toDF("x")
    val cur = (0 to 99).map(i => Tuple1(i.toLong + 1000L)).toDF("x")
    val rows = Profiler.distributionDrift(ref, cur, Seq("x"), 10)
      .as[(String, Long, Long, Long, Long)].collect()
    // every current value exceeds the reference max → all mass clamps
    // into the LAST bucket
    val qMap = rows.map(r => r._2 -> r._4).toMap
    assert(qMap(9L) === 918181L, s"clamped mass must land in bucket 9: $qMap")
    // empty buckets still smooth to (0+1)*1e6 div (100+10)
    assert((0L to 8L).forall(b => qMap(b) === 9090L), s"others smoothed: $qMap")
    val again = Profiler.distributionDrift(ref.repartition(7),
      cur.repartition(5), Seq("x"), 10)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.sortBy(_._2).toSeq === again.sortBy(_._2).toSeq)
  }
}
