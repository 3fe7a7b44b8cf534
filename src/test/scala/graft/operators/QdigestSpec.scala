package graft.operators

import graft.SparkSpec

/** Q-digest quantile sketch: compression semantics, the rank-error
  * bound vs the exact quantiles, and order-insensitive merging. Data is
  * integers 0..N-1 with lo=0, hi=65536, so leaf == value and ranks are
  * directly readable (count(data ≤ v) = v+1).
  */
class QdigestSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq(100, 250, 500, 900, 990, 1000)

  test("k >= n disables compression: answers are the exact type-1 quantiles") {
    val n = 2000
    val df = (0 until n).map(_.toDouble).toDF("v")
    val st = Sketches.qdigestState(df, "v", lo = 0.0, hi = 65536.0, k = 1 << 20)
    // uncompressed state = raw leaf counts
    assert(st.count() == n)
    val got = Sketches.qdigestQuantile(st, 0.0, 65536.0, qs)
      .select("q_milli", "v_est").as[(Long, Double)].collect().toMap
    qs.foreach { q =>
      // exact type-1 quantile of 0..n-1 is value ceil(q*n/1000)-1; the
      // sketch answers its leaf's EXCLUSIVE upper bound = value+1
      val exact = math.ceil(q.toDouble * n / 1000).toLong - 1
      assert(got(q.toLong) == exact + 1.0, s"q=$q")
    }
  }

  test("compressed sketch: rank error bounded by L·t vs exact quantiles") {
    val n = 10000
    val k = 1024
    val df = (0 until n).map(_.toDouble).toDF("v")
    val st = Sketches.qdigestState(df, "v", lo = 0.0, hi = 65536.0, k = k)
    val nodes = st.count()
    assert(nodes < n / 2, s"compression must shrink the state, got $nodes nodes")
    val t = math.max(n / k, 1) // engine threshold
    val bound = 16L * t // L levels, each can defer < t counts upward
    val got = Sketches.qdigestQuantile(st, 0.0, 65536.0, qs)
      .select("q_milli", "v_est").as[(Long, Double)].collect().toMap
    qs.foreach { q =>
      val target = (q.toLong * n + 999) / 1000 // ceil(q*n/1000)
      val rankOfEst = math.min(got(q.toLong).toLong, n.toLong) // count(data ≤ est−1)=est, clamped
      assert(rankOfEst >= target,
        s"q=$q: est rank $rankOfEst below target $target — sketch may never undershoot")
      assert(rankOfEst <= target + bound,
        s"q=$q: est rank $rankOfEst exceeds target $target + bound $bound")
    }
  }

  test("merge is order-insensitive and answers within the bound at the merged n") {
    val n = 10000
    val k = 1024
    val evens = (0 until n by 2).map(_.toDouble).toDF("v")
    val odds = (1 until n by 2).map(_.toDouble).toDF("v")
    val sa = Sketches.qdigestState(evens, "v", 0.0, 65536.0, k)
      .localCheckpoint(true)
    val sb = Sketches.qdigestState(odds, "v", 0.0, 65536.0, k)
      .localCheckpoint(true)
    val ab = Sketches.qdigestMerge(Seq(sa, sb), k)
      .as[(Long, Long)].collect().toSeq.sorted
    val ba = Sketches.qdigestMerge(Seq(sb, sa), k)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(ab === ba, "merge must not depend on argument order")
    val got = Sketches.qdigestQuantile(
        Sketches.qdigestMerge(Seq(sa, sb), k), 0.0, 65536.0, qs)
      .select("q_milli", "v_est").as[(Long, Double)].collect().toMap
    // merged sketch re-compresses pre-compressed halves: each level of
    // each compression stage defers < t, so 3 stages bound 3·L·t
    val t = math.max(n / k, 1)
    val bound = 3L * 16L * t
    qs.foreach { q =>
      val target = (q.toLong * n + 999) / 1000
      val rankOfEst = math.min(got(q.toLong).toLong, n.toLong)
      assert(rankOfEst >= target && rankOfEst <= target + bound,
        s"q=$q: merged est rank $rankOfEst vs target $target (bound $bound)")
    }
  }

  test("grouped sketch: each group answers from its OWN distribution; groups never mix") {
    val s = spark
    import s.implicits._
    // group a is 0..999, group b is 5000..5999 — disjoint ranges, so a
    // cross-group leak would be instantly visible in the answers
    val df = ((0 until 1000).map(i => ("a", i.toDouble)) ++
      (0 until 1000).map(i => ("b", 5000.0 + i))).toDF("g", "v")
    val st = Sketches.qdigestStateBy(df, "g", "v", 0.0, 65536.0, k = 1 << 20)
    val got = Sketches.qdigestQuantileBy(st, 0.0, 65536.0, Seq(500, 1000))
      .select("grp", "q_milli", "v_est").as[(String, Long, Double)]
      .collect().map { case (g, q, v) => (g, q) -> v }.toMap
    // uncompressed identity leaves: answer = exact value + 1 (upper edge)
    assert(got(("a", 500L)) == 500.0 && got(("a", 1000L)) == 1000.0)
    assert(got(("b", 500L)) == 5500.0 && got(("b", 1000L)) == 6000.0)
    // per-group merge: half-states recombine order-insensitively
    val h1 = Sketches.qdigestStateBy(df.filter($"v" % 2 === 0), "g", "v",
      0.0, 65536.0, 1024).localCheckpoint(true)
    val h2 = Sketches.qdigestStateBy(df.filter($"v" % 2 === 1), "g", "v",
      0.0, 65536.0, 1024).localCheckpoint(true)
    val ab = Sketches.qdigestMergeBy(Seq(h1, h2), 1024)
      .as[(String, Long, Long)].collect().toSeq.sorted
    val ba = Sketches.qdigestMergeBy(Seq(h2, h1), 1024)
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(ab === ba)
  }

  test("validation: bad k, bad range, bad quantiles rejected") {
    val df = Seq(1.0).toDF("v")
    intercept[IllegalArgumentException](
      Sketches.qdigestState(df, "v", 0.0, 65536.0, k = 1))
    intercept[IllegalArgumentException](
      Sketches.qdigestState(df, "v", 5.0, 5.0, k = 64))
    val st = Sketches.qdigestState(df, "v", 0.0, 65536.0, k = 64)
    intercept[IllegalArgumentException](
      Sketches.qdigestQuantile(st, 0.0, 65536.0, Seq(0)))
    intercept[IllegalArgumentException](
      Sketches.qdigestQuantile(st, 0.0, 65536.0, Nil))
  }
}
