package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The MERGE layer semantics (reference
  * `storage/azurestoragewrapper.py:183,227-231,251-258`): REPLACE =
  * last-writer-wins by version with total-order tiebreak; MERGE = only
  * non-default update columns win; both idempotent under re-run.
  */
class KeyedTableSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    ("p1", "r1", 10, "a"),
    ("p1", "r2", 20, "b"),
    ("p2", "r1", 30, "c")).toDF("pk", "rk", "n", "s")

  test("upsertReplace: update wins whole-row, new keys appended") {
    val upd = Seq(("p1", "r1", 99, "z"), ("p3", "r9", 1, "new"))
      .toDF("pk", "rk", "n", "s")
    val out = KeyedTable.upsertReplace(
      target.withColumn("_v", lit(1)), upd.withColumn("_v", lit(2)),
      Seq("pk", "rk"), "_v", tiebreak = Seq("n"))
    val rows = out.select("pk", "rk", "n", "s").as[(String, String, Int, String)]
      .collect().map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(rows(("p1", "r1")) == (99, "z"))
    assert(rows(("p1", "r2")) == (20, "b"))
    assert(rows(("p3", "r9")) == (1, "new"))
    assert(out.count() == 4)
  }

  test("upsertReplace is idempotent: applying the same update twice = once") {
    val upd = Seq(("p1", "r1", 99, "z")).toDF("pk", "rk", "n", "s")
    val once = KeyedTable.upsertReplace(
      target.withColumn("_v", lit(1)), upd.withColumn("_v", lit(2)),
      Seq("pk", "rk"), "_v", Seq("n", "s"))
    val twice = KeyedTable.upsertReplace(
      once, upd.withColumn("_v", lit(2)), Seq("pk", "rk"), "_v", Seq("n", "s"))
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("upsertMerge: only non-default update columns win (partial update)") {
    // n default 0, s default "" — update supplies n=0 (→ old survives)
    // and s="patched" (→ wins)
    val upd = Seq(("p1", "r1", 0, "patched")).toDF("pk", "rk", "n", "s")
    val out = KeyedTable.upsertMerge(target, upd, Seq("pk", "rk"),
      Map("n" -> 0, "s" -> ""))
    val rows = out.as[(String, String, Int, String)]
      .collect().map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(rows(("p1", "r1")) == (10, "patched"))
    assert(rows(("p1", "r2")) == (20, "b"))
  }

  test("upsertMerge: unmatched update key inserts with defaults for missing values") {
    val upd = Seq(("p9", "r9", 5, "")).toDF("pk", "rk", "n", "s")
    val out = KeyedTable.upsertMerge(target, upd, Seq("pk", "rk"),
      Map("n" -> 0, "s" -> ""))
    val rows = out.as[(String, String, Int, String)]
      .collect().map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(rows(("p9", "r9")) == (5, ""))
    assert(out.count() == 4)
  }

  test("deleteByKeys tolerates missing keys (K5)") {
    val del = Seq(("p1", "r1"), ("nope", "nope")).toDF("pk", "rk")
    val out = KeyedTable.deleteByKeys(target, del, Seq("pk", "rk"))
    assert(out.count() == 2)
    assert(out.filter($"pk" === "p1" && $"rk" === "r1").isEmpty)
  }

  test("insertIfAbsent only appends new keys (K8)") {
    val ins = Seq(("p1", "r1", 999, "dupe"), ("p4", "r4", 4, "new"))
      .toDF("pk", "rk", "n", "s")
    val out = KeyedTable.insertIfAbsent(target, ins, Seq("pk", "rk"))
    val rows = out.as[(String, String, Int, String)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(rows(("p1", "r1")) == 10) // original survived
    assert(rows(("p4", "r4")) == 4)
    assert(out.count() == 4)
  }

  test("importOnce skips partitions already present (U2)") {
    val existing = Seq(("2021_01_01", 1), ("2021_01_02", 2)).toDF("day", "x")
    val incoming = Seq(("2021_01_02", 99), ("2021_01_03", 3)).toDF("day", "x")
    val out = KeyedTable.importOnce(existing, incoming, "day")
    val rows = out.as[(String, Int)].collect().toMap
    assert(rows == Map("2021_01_01" -> 1, "2021_01_02" -> 2, "2021_01_03" -> 3))
  }

  test("lookupEnrich falls back to the default on miss ('Sonstiges', J1)") {
    val facts = Seq((1, "a"), (7, "b")).toDF("gid", "payload")
    val dim = Seq((1, "Spielfilm")).toDF("Genre_Id", "Genre")
    val out = KeyedTable.lookupEnrich(facts, dim, "gid", "Genre_Id", "Genre",
      "genre", "Sonstiges")
    val rows = out.select("gid", "genre").as[(Int, String)].collect().toMap
    assert(rows == Map(1 -> "Spielfilm", 7 -> "Sonstiges"))
  }

  test("exists is a bounded probe (P6)") {
    assert(KeyedTable.exists(target))
    assert(!KeyedTable.exists(target.filter($"n" > 1000)))
  }
}
