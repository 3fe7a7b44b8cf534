package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalSpec extends SparkSpec {

  private def rows(seed: Int, n: Int) = {
    val s = spark
    import s.implicits._
    (1 to n).map(i => (s"g${(i + seed) % 3}", (i * 7 + seed) % 100 / 10.0))
      .toDF("g", "v")
  }

  private def finished(df: DataFrame) =
    df.orderBy("g").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq

  test("merged batch states equal the full recompute, any merge grouping") {
    val keys = Seq("g"); val ms = Seq("v")
    val b1 = rows(0, 100); val b2 = rows(1, 50); val b3 = rows(2, 75)
    val full = Incremental.state(b1.unionByName(b2).unionByName(b3), keys, ms)
    val leftFold = Incremental.merge(Seq(
      Incremental.merge(Seq(Incremental.state(b1, keys, ms),
        Incremental.state(b2, keys, ms)), keys, ms),
      Incremental.state(b3, keys, ms)), keys, ms)
    val flat = Incremental.merge(
      Seq(b3, b1, b2).map(Incremental.state(_, keys, ms)), keys, ms)
    val exp = finished(Incremental.finish(full, keys, ms))
    assert(finished(Incremental.finish(leftFold, keys, ms)) === exp)
    assert(finished(Incremental.finish(flat, keys, ms)) === exp)
  }

  test("empty delta is a merge identity") {
    val s = spark
    import s.implicits._
    val keys = Seq("g"); val ms = Seq("v")
    val base = Incremental.state(rows(0, 60), keys, ms)
    val empty = Incremental.state(rows(0, 60).filter(lit(false)), keys, ms)
    assert(finished(Incremental.finish(Incremental.merge(Seq(base, empty), keys, ms), keys, ms))
      === finished(Incremental.finish(base, keys, ms)))
  }

  test("finish derives avg = sum / count") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("g", "v")
    val out = finished(Incremental.finish(
      Incremental.state(df, Seq("g"), Seq("v")), Seq("g"), Seq("v")))
    assert(out === Seq(("a", 2L, 3.0, 1.5), ("b", 1L, 5.0, 5.0)))
  }

  test("joinDelta: old view + delta equals the full join, each pair exactly once") {
    val s = spark
    import s.implicits._
    // all four quadrants populated: old⋈old, new⋈old, old⋈new, new⋈new
    val aOld = Seq((1, "ao1"), (2, "ao2")).toDF("k", "a")
    val dA = Seq((1, "an1"), (3, "an3")).toDF("k", "a")
    val bOld = Seq((1, "bo1"), (3, "bo3")).toDF("k", "b")
    val dB = Seq((1, "bn1"), (2, "bn2")).toDF("k", "b")
    val view = aOld.join(bOld, Seq("k"))
      .unionByName(Incremental.joinDelta(aOld, dA, bOld, dB, Seq("k")))
      .as[(Int, String, String)].collect().toSeq.sorted
    val full = aOld.unionByName(dA).join(bOld.unionByName(dB), Seq("k"))
      .as[(Int, String, String)].collect().toSeq.sorted
    assert(view === full, "maintained view must equal the one-shot join")
    assert(view.size === view.distinct.size, "no pair may appear twice")
    // empty deltas contribute nothing
    val empty = Incremental.joinDelta(aOld, dA.limit(0), bOld, dB.limit(0), Seq("k"))
    assert(empty.count() == 0L)
  }

  private def asView(df: DataFrame) = df.groupBy("g")
    .agg(count(lit(1)).as("n_rows"), sum("v").as("sum_v"))

  private def viewMap(df: DataFrame) =
    df.collect().map(r => Option(r.get(0)).map(_.toString) ->
      ((r.getLong(1), r.getLong(2)))).toMap

  test("maintainGroupAgg: inserts, deletes, group-moving updates, and null groups all fold exactly") {
    val s = spark
    import s.implicits._
    val oldSnap = Seq(
      (1L, Some("a"), 10L), (2L, Some("a"), 20L), (3L, Some("b"), 30L),
      (4L, Option.empty[String], 40L), (5L, Some("c"), 50L))
      .toDF("k", "g", "v")
    val newSnap = Seq(
      (1L, Some("a"), 11L),              // value update in place
      (2L, Some("b"), 20L),              // MOVES a → b
      (4L, Option.empty[String], 45L),   // null-group update
      (6L, Some("d"), 60L),              // insert into a NEW group
      (7L, Some("b"), 7L))               // plain insert; 3 unchanged, 5 deleted
      .toDF("k", "g", "v")
    val got = viewMap(Incremental.maintainGroupAgg(
      asView(oldSnap), oldSnap, newSnap, Seq("k"), "g", "v"))
    assert(got === viewMap(asView(newSnap)),
      "maintained view must equal the direct aggregate")
    // group c died (its only row deleted) — it must be GONE, not (0, 0)
    assert(!got.contains(Some("c")))
    assert(got(None) === ((1L, 45L)))
  }

  test("maintainGroupAgg: no-op diff returns the view unchanged; partitioning-invariant") {
    val s = spark
    import s.implicits._
    val snap = (1 to 100).map(i => (i.toLong, Some(s"g${i % 7}"), i.toLong))
      .toDF("k", "g", "v")
    val view = asView(snap)
    val same = viewMap(Incremental.maintainGroupAgg(view, snap, snap,
      Seq("k"), "g", "v"))
    assert(same === viewMap(view))
    val newSnap = snap.filter(col("k") % 3 =!= 0)
      .union(Seq((200L, Some("g0"), 9L)).toDF("k", "g", "v"))
    val a = viewMap(Incremental.maintainGroupAgg(view, snap, newSnap,
      Seq("k"), "g", "v"))
    val b = viewMap(Incremental.maintainGroupAgg(view, snap.repartition(11),
      newSnap.repartition(5), Seq("k"), "g", "v"))
    assert(a === b)
    assert(a === viewMap(asView(newSnap)))
  }
}
