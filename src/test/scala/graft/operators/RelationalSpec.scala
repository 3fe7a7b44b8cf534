package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin attaches the latest right row at-or-before each left time") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")),
      (2L, "a", ts("2024-01-01 12:00:00")),
      (3L, "a", ts("2024-01-01 09:00:00")), // before any right row
      (4L, "b", ts("2024-01-01 10:30:00"))
    ).toDF("id", "k", "t")
    val right = Seq(
      ("a", ts("2024-01-01 09:30:00"), 1.0),
      ("a", ts("2024-01-01 11:00:00"), 2.0),
      ("a", ts("2024-01-01 12:00:00"), 3.0), // tie with left id=2 → included
      ("b", ts("2024-01-01 10:30:00"), 9.0)
    ).toDF("k", "rt", "v")

    val out = Relational.asofJoin(left, right, "k", "t", "rt", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap

    assert(out(1L) === Some(1.0)) // 09:30 row, not 11:00
    assert(out(2L) === Some(3.0)) // exact tie included
    assert(out(3L) === None)      // nothing at-or-before 09:00
    assert(out(4L) === Some(9.0)) // tie on the other key
  }

  test("asofJoin forward attaches the earliest right row at-or-after each left time") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")),
      (2L, "a", ts("2024-01-01 12:00:00")), // tie with right at 12:00 → included
      (3L, "a", ts("2024-01-01 13:00:00"))  // nothing at-or-after
    ).toDF("id", "k", "t")
    val right = Seq(
      ("a", ts("2024-01-01 11:00:00"), 2.0),
      ("a", ts("2024-01-01 12:00:00"), 3.0)
    ).toDF("k", "rt", "v")
    val out = Relational.asofJoin(left, right, "k", "t", "rt", Seq("v"), forward = true)
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L) === Some(2.0)) // 11:00, not 12:00
    assert(out(2L) === Some(3.0)) // exact tie included
    assert(out(3L) === None)
  }

  test("asofJoin is window-based: no join operator in the physical plan") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "a", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq(("a", ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "rt", "v")
    val plan = Relational.asofJoin(left, right, "k", "t", "rt", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"as-of join must be union+window, not a range-predicate join:\n$plan")
  }

  test("asofJoin rejects carried-column collisions with the left frame") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "a", ts("2024-01-01 10:00:00"), 0.0)).toDF("id", "k", "t", "asof_v")
    val right = Seq(("a", ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "rt", "v")
    intercept[IllegalArgumentException](
      Relational.asofJoin(left, right, "k", "t", "rt", Seq("v")))
  }

  test("rangeJoinPairs rejects overlapping column names between the two sides") {
    val s = spark
    import s.implicits._
    val iv = Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))).toDF("id", "s0", "e0")
    val pts = Seq((2L, ts("2024-01-01 10:30:00"))).toDF("id", "pt")
    intercept[IllegalArgumentException](
      Relational.rangeJoinPairs(iv, "s0", "e0", pts, "pt", 300L))
  }

  test("rangeJoinPairs emits each containment pair exactly once, incl. bin-spanning intervals") {
    val s = spark
    import s.implicits._
    // 10-minute interval spans two 5-minute bins; points at start (in),
    // end (out, half-open), and mid-bin boundary (in, once)
    val iv = Seq((100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")))
      .toDF("iid", "s0", "e0")
    val pts = Seq(
      (1L, ts("2024-01-01 10:00:00")),  // == start → in
      (2L, ts("2024-01-01 10:05:00")),  // bin boundary inside → exactly once
      (3L, ts("2024-01-01 10:10:00")),  // == end → out (half-open)
      (4L, ts("2024-01-01 09:59:59"))   // before → out
    ).toDF("pid", "pt")
    val got = Relational.rangeJoinPairs(iv, "s0", "e0", pts, "pt", 300L)
      .select("pid").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L))
  }

  test("rangeJoinPairs is an equi-join on the bin — no nested-loop join") {
    val s = spark
    import s.implicits._
    val iv = Seq((100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")))
      .toDF("iid", "s0", "e0")
    val pts = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("pid", "pt")
    val plan = Relational.rangeJoinPairs(iv, "s0", "e0", pts, "pt", 300L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"),
      s"range join must bucket to an equi-join, got:\n$plan")
  }

  test("scd2Intervals builds half-open history with deterministic tie-break") {
    val s = spark
    import s.implicits._
    val updates = Seq(
      ("c1", ts("2024-01-01 00:00:00"), 10.0, 1L),
      ("c1", ts("2024-01-01 00:00:00"), 11.0, 2L), // same instant: max tiebreak wins
      ("c1", ts("2024-02-01 00:00:00"), 20.0, 3L),
      ("c2", ts("2024-01-15 00:00:00"), 5.0, 4L)
    ).toDF("k", "t", "v", "seq")
    val out = Relational.scd2Intervals(updates, "k", "t", "v", "seq")
      .orderBy("k", "valid_from").collect()
    assert(out.length === 3)
    val r0 = out(0)
    assert(r0.getAs[Double]("v") === 11.0) // tiebreak by seq
    assert(r0.getAs[Timestamp]("valid_to") === ts("2024-02-01 00:00:00"))
    assert(!r0.getAs[Boolean]("is_current"))
    assert(out(1).getAs[Timestamp]("valid_to") == null)
    assert(out(1).getAs[Boolean]("is_current"))
    assert(out(2).getAs[Boolean]("is_current"))
  }

  test("intervalOverlapPairs: exactly-once pairs, half-open adjacency, bin spanning") {
    val s = spark
    import s.implicits._
    val l = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:20:00")),  // spans 4 bins
      (2L, ts("2024-01-01 11:00:00"), ts("2024-01-01 11:05:00"))
    ).toDF("lid", "ls", "le")
    val r = Seq(
      (10L, ts("2024-01-01 10:15:00"), ts("2024-01-01 10:40:00")), // overlaps 1 across 2 shared bins
      (11L, ts("2024-01-01 09:50:00"), ts("2024-01-01 10:30:00")), // CONTAINS 1 (4 shared bins)
      (12L, ts("2024-01-01 10:20:00"), ts("2024-01-01 10:25:00")), // touches 1's end → NO (half-open)
      (13L, ts("2024-01-01 11:04:59"), ts("2024-01-01 11:06:00"))  // 1s overlap with 2
    ).toDF("rid", "rs", "re")
    val got = Relational.intervalOverlapPairs(l, "ls", "le", r, "rs", "re", 300L)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, 10L), (1L, 11L), (2L, 13L)))
  }

  test("intervalOverlapPairs buckets to an equi-join — no nested loop") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:20:00"))).toDF("lid", "ls", "le")
    val r = Seq((10L, ts("2024-01-01 10:15:00"), ts("2024-01-01 10:40:00"))).toDF("rid", "rs", "re")
    val plan = Relational.intervalOverlapPairs(l, "ls", "le", r, "rs", "re", 300L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"overlap join must bucket to an equi-join:\n$plan")
    intercept[IllegalArgumentException](
      Relational.intervalOverlapPairs(l, "ls", "le", r.withColumnRenamed("rs", "ls"),
        "ls", "re", 300L))
  }

  test("tableDiff classifies inserts, deletes, updates and counts changed columns") {
    val s = spark
    import s.implicits._
    val oldS = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "s", "v")
    val newS = Seq((2L, "b", 20L), (3L, "X", 31L), (4L, "d", 40L))
      .toDF("k", "s", "v")
    val got = Relational.tableDiff(oldS, newS, Seq("k"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    // key 2 unchanged → absent; key 3 changes both value columns
    assert(got === Seq((1L, "delete", 0L), (3L, "update", 2L), (4L, "insert", 0L)))
  }

  test("tableDiff is null-safe: null↔value is a change, null↔null is not") {
    val s = spark
    import s.implicits._
    val oldS = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "s")
    val newS = Seq((1L, Option.empty[String]), (2L, Some("v")))
      .toDF("k", "s")
    val got = Relational.tableDiff(oldS, newS, Seq("k"))
      .as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((2L, "update", 1L)))
  }

  test("tableDiff survives adversarial user column names") {
    val s = spark
    import s.implicits._
    // value columns named 'present', 'x'/'o_x' used to collide with the
    // side-renaming scheme; struct packing makes them just values
    val oldS = Seq((1L, true, "a", "b")).toDF("k", "present", "x", "o_x")
    val newS = Seq((1L, false, "a", "b"), (2L, true, "c", "d"))
      .toDF("k", "present", "x", "o_x")
    val got = Relational.tableDiff(oldS, newS, Seq("k"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "update", 1L), (2L, "insert", 0L)))
    // only the two generated struct names are reserved, and only as keys
    intercept[IllegalArgumentException](Relational.tableDiff(
      oldS.withColumnRenamed("k", "__tdiff_o"),
      newS.withColumnRenamed("k", "__tdiff_o"), Seq("__tdiff_o")))
  }

  test("tableDiff rejects schema mismatch and key-only tables") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, "x")).toDF("k", "s")
    intercept[IllegalArgumentException](
      Relational.tableDiff(a, a.withColumnRenamed("s", "t"), Seq("k")))
    intercept[IllegalArgumentException](
      Relational.tableDiff(a.select("k"), a.select("k"), Seq("k")))
  }
}
