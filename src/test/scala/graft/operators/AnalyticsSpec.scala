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
}
