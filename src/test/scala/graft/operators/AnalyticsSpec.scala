package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("funnel counts users per step under the conversion window") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      // u1 completes: view@0 → click@10 → buy@20
      (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "buy", ts(20)),
      // u2 clicks too late (window 30 min)
      (2L, "view", ts(0)), (2L, "click", ts(45)), (2L, "buy", ts(50)),
      // u3 clicked BEFORE the first view — not a conversion
      (3L, "click", ts(0)), (3L, "view", ts(10)), (3L, "buy", ts(20)),
      // u4 views only
      (4L, "view", ts(0))
    ).toDF("user_id", "event_type", "t")
    val out = Analytics.funnel(ev, "user_id", "event_type", "t",
      Seq("view", "click", "buy"), windowSec = 1800L)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, "view", 4L), (2L, "click", 1L), (3L, "buy", 1L)))
  }

  test("funnel step time anchors on when the PREVIOUS step was reached") {
    val s = spark
    import s.implicits._
    // u1 reaches click at minute 10; buy at 35 is within 30 min of the
    // click even though it is 35 min after the view
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "buy", ts(35))
    ).toDF("user_id", "event_type", "t")
    val out = Analytics.funnel(ev, "user_id", "event_type", "t",
      Seq("view", "click", "buy"), windowSec = 1800L)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.map(_._3).toSeq === Seq(1L, 1L, 1L))
  }

  test("funnel rejects degenerate configs") {
    val s = spark
    import s.implicits._
    val ev = Seq((1L, "view", ts(0))).toDF("user_id", "event_type", "t")
    intercept[IllegalArgumentException](
      Analytics.funnel(ev, "user_id", "event_type", "t", Seq("view"), 60L))
    intercept[IllegalArgumentException](
      Analytics.funnel(ev, "user_id", "event_type", "t", Seq("view", "click"), 0L))
  }

  test("transitionMatrix counts ordered per-user type transitions") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, 1L, "view", ts(0)), (1L, 2L, "click", ts(1)), (1L, 3L, "view", ts(2)),
      (2L, 4L, "view", ts(0)), (2L, 5L, "click", ts(1)),
      (3L, 6L, "buy", ts(5)) // single event → no transition
    ).toDF("user_id", "event_id", "event_type", "t")
    val out = Analytics.transitionMatrix(ev, "user_id", "event_type", "t", "event_id")
      .as[(String, String, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(out === Map(("view", "click") -> 2L, ("click", "view") -> 1L))
  }

  test("transitionMatrix breaks timestamp ties deterministically by the tie column") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, 10L, "a", ts(0)), (1L, 11L, "b", ts(0)), (1L, 12L, "c", ts(0))
    ).toDF("user_id", "event_id", "event_type", "t")
    val out = Analytics.transitionMatrix(ev, "user_id", "event_type", "t", "event_id")
      .as[(String, String, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(out === Map(("a", "b") -> 1L, ("b", "c") -> 1L))
  }

  test("gapFill emits the full calendar with zero-filled gaps and LOCF values") {
    val s = spark
    import s.implicits._
    def hour(h: Int) = new Timestamp(h * 3600000L)
    val ev = Seq(
      ("a", hour(0), 10.0), ("a", hour(0), 12.0), // hour 0: n=2, max 12
      ("a", hour(3), 7.0),                         // hours 1-2 are gaps
      ("b", hour(1), 5.0)                          // b observed only at hour 1
    ).toDF("k", "t", "v")
    val out = Analytics.gapFill(ev, "k", "t", "v", "hour")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000L) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    // span is the TABLE's [min, max] = hours 0..3, for both keys
    assert(out.size === 8)
    assert(out(("a", 0L)) === ((2L, Some(12.0))))
    assert(out(("a", 1L)) === ((0L, Some(12.0)))) // gap: 0 count, LOCF
    assert(out(("a", 2L)) === ((0L, Some(12.0))))
    assert(out(("a", 3L)) === ((1L, Some(7.0))))
    assert(out(("b", 0L)) === ((0L, None)))       // before first observation
    assert(out(("b", 1L)) === ((1L, Some(5.0))))
    assert(out(("b", 3L)) === ((0L, Some(5.0))))
  }

  test("gapFill at day granularity spans the full calendar") {
    val s = spark
    import s.implicits._
    def day(d: Int) = new Timestamp(d * 86400000L)
    val ev = Seq(("a", day(0), 1.0), ("a", day(4), 2.0)).toDF("k", "t", "v")
    val out = Analytics.gapFill(ev, "k", "t", "v", "day")
      .collect().map(r => r.getTimestamp(1).getTime / 86400000L -> r.getLong(2)).toMap
    assert(out === Map(0L -> 1L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("gapFill on an empty frame returns no rows") {
    val s = spark
    import s.implicits._
    val ev = Seq(("a", ts(0), 1.0)).toDF("k", "t", "v").filter(org.apache.spark.sql.functions.lit(false))
    assert(Analytics.gapFill(ev, "k", "t", "v", "hour").count() === 0L)
  }

  test("gapFill rejects unsupported units") {
    val s = spark
    import s.implicits._
    val ev = Seq(("a", ts(0), 1.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException](Analytics.gapFill(ev, "k", "t", "v", "minute"))
  }

  test("cohortRetention buckets by first-seen day with correct offsets") {
    val s = spark
    import s.implicits._
    def day(d: Int, h: Int = 0) = new Timestamp((d * 24L + h) * 3600000L)
    val ev = Seq(
      (1L, day(0)), (1L, day(0, 5)), (1L, day(2)),  // cohort day0: offsets 0,0,2
      (2L, day(0)), (2L, day(1)),                    // cohort day0: offsets 0,1
      (3L, day(1)), (3L, day(2))                     // cohort day1: offsets 0,1
    ).toDF("user_id", "t")
    val out = Analytics.cohortRetention(ev, "user_id", "t")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(out(("1970-01-01", 0L)) === 2L) // u1, u2 active on their day 0
    assert(out(("1970-01-01", 1L)) === 1L) // u2
    assert(out(("1970-01-01", 2L)) === 1L) // u1
    assert(out(("1970-01-02", 0L)) === 1L) // u3
    assert(out(("1970-01-02", 1L)) === 1L) // u3
    assert(out.size === 5)
  }

  test("groupedOls recovers an exact linear relation; r² = 1") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.col
    // y = 3x + 5 exactly, two groups with different x ranges
    val df = (1 to 20).map(i => ("a", i.toDouble, 3.0 * i + 5.0)) ++
      (1 to 20).map(i => ("b", (i + 100).toDouble, 3.0 * (i + 100) + 5.0))
    val out = Analytics.groupedOls(df.toDF("g", "x", "y"), "g",
      col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    for (g <- Seq("a", "b")) {
      val (slope, intercept, r2) = out(g)
      assert(math.abs(slope - 3.0) < 1e-9, s"$g slope $slope")
      // intercept is in quantized units (×10⁴)
      assert(math.abs(intercept / 10000.0 - 5.0) < 1e-6, s"$g intercept $intercept")
      assert(math.abs(r2 - 1.0) < 1e-12, s"$g r2 $r2")
    }
  }

  test("groupedOls matches a driver-side least-squares fit on noisy data") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.col
    // deterministic pseudo-noise
    val pts = (1 to 500).map { i =>
      val x = i.toDouble / 7.0
      val noise = ((i * 2654435761L) % 1000).toDouble / 500.0 - 1.0
      (x, 2.5 * x + noise)
    }
    val out = Analytics.groupedOls(
      pts.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y"), "g",
      col("x"), col("y")).collect().head
    // brute-force fit over the SAME quantized values
    val q = pts.map { case (x, y) =>
      (math.floor(x * 10000.0), math.floor(y * 10000.0)) }
    val n = q.size.toDouble
    val (sx, sy) = (q.map(_._1).sum, q.map(_._2).sum)
    val sxx = q.map(p => p._1 * p._1).sum
    val sxy = q.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icpt = (sy - slope * sx) / n
    assert(math.abs(out.getDouble(2) - slope) < 1e-9 * math.abs(slope))
    assert(math.abs(out.getDouble(3) - icpt) < 1e-6 * math.abs(icpt).max(1.0))
    assert(out.getDouble(4) > 0.99 && out.getDouble(4) < 1.0) // strong but noisy
  }

  test("decayedSums equals the brute-force decay triangle; partitioning-invariant") {
    val s = spark; import s.implicits._
    // key A: values in buckets 0,1,3 (gap at 2); key B: one bucket
    val rows = Seq(("A", 5L, 100L), ("A", 7L, 3L), ("A", 15L, 40L),
      ("A", 31L, 9L), ("B", 12L, 77L))
    def run(parts: Int) = Analytics.decayedSums(
      rows.toDF("k", "tus", "v").repartition(parts), "k", "tus", "v",
      bucketMicros = 10L, maxLookback = 40)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = run(1)
    // bucket sums: A → {0: 103, 1: 40, 3: 9}; B → {1: 77}
    assert(got == Map(
      ("A", 0L) -> 103L,
      ("A", 1L) -> (103L / 2 + 40L),            // 91
      ("A", 3L) -> (103L / 8 + 40L / 4 + 9L),   // 12 + 10 + 9 = 31
      ("B", 1L) -> 77L))
    assert(run(7) == got, "decay must be partitioning-invariant")
  }

  test("decayedSums drops contributions beyond maxLookback; shifts floor exactly") {
    val s = spark; import s.implicits._
    val rows = Seq(("k", 0L, 1000L), ("k", 50L, 1L)) // buckets 0 and 5
    val got = Analytics.decayedSums(rows.toDF("k", "tus", "v"),
      "k", "tus", "v", bucketMicros = 10L, maxLookback = 3)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // bucket 5 is 5 > maxLookback=3 buckets past bucket 0: no carry-over
    assert(got == Map(0L -> 1000L, 5L -> 1L))
    val g2 = Analytics.decayedSums(rows.toDF("k", "tus", "v"),
      "k", "tus", "v", bucketMicros = 10L, maxLookback = 5)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(g2 == Map(0L -> 1000L, 5L -> (1000L / 32 + 1L))) // 31 + 1
  }
}
