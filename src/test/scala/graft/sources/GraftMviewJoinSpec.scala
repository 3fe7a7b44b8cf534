package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Fact ⋈ dims materialized views (round 14): `create_mview_sql`
  * accepts a left-deep star join — fact (leftmost, CDC-driving) INNER
  * or LEFT OUTER joined to N dims — and folds insert-only FACT deltas
  * incrementally (delta ⋈ broadcast dims → partial aggregate → state
  * MERGE) while ANY dim-side change forces the honest full recompute
  * (dim anchors persist in the mview config and re-pin on recompute).
  */
class GraftMviewJoinSpec extends SparkSpec {

  private def freshCatalog(): String = {
    val root = Files.createTempDirectory("graft_mvj").toString
    val cat = s"mvj_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  private def seed(cat: String): Unit = {
    spark.sql(s"""CREATE TABLE $cat.db.fact (
        id BIGINT, rid BIGINT, cents BIGINT)
      TBLPROPERTIES ('keys'='id')""")
    spark.sql(s"""CREATE TABLE $cat.db.dim (
        rid BIGINT, region STRING) TBLPROPERTIES ('keys'='rid')""")
    spark.sql(s"""INSERT INTO $cat.db.dim
      SELECT id, concat('r', CAST(id % 3 AS STRING)) FROM range(8)""")
    spark.sql(s"""INSERT INTO $cat.db.fact
      SELECT id, id % 10, id * 7 FROM range(100)""")
  }

  private def direct(cat: String): Map[String, (Long, Long)] =
    spark.sql(s"""SELECT d.region, sum(f.cents) AS total,
        count(*) AS n
      FROM $cat.db.fact f JOIN $cat.db.dim d ON f.rid = d.rid
      GROUP BY d.region""").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def viewed(cat: String): Map[String, (Long, Long)] =
    spark.sql(s"SELECT region, total, n FROM $cat.db.rollup")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("star rollup: create ≡ SELECT, fact delta folds incrementally, " +
    "dim change forces full recompute") {
    val cat = freshCatalog()
    seed(cat)
    spark.sql(s"""CALL $cat.system.create_mview_sql('db.rollup', sql =>
      "SELECT d.region, sum(f.cents) AS total, count(*) AS n
       FROM $cat.db.fact f JOIN $cat.db.dim d ON f.rid = d.rid
       GROUP BY d.region")""")
    assert(viewed(cat) == direct(cat))
    // insert-only FACT delta → INCREMENTAL
    spark.sql(s"""INSERT INTO $cat.db.fact
      SELECT id, id % 10, id * 3 FROM range(100, 160)""")
    val r1 = spark.sql(s"CALL $cat.system.refresh_mview('db.rollup')")
      .collect()(0)
    assert(r1.getString(1) == "incremental", r1.toString)
    assert(viewed(cat) == direct(cat))
    // DIM update (a region rename rewrites history for joined fact
    // rows) → the incremental path is ineligible: FULL, re-anchored
    spark.sql(s"UPDATE $cat.db.dim SET region = 'rX' WHERE rid = 1")
    val r2 = spark.sql(s"CALL $cat.system.refresh_mview('db.rollup')")
      .collect()(0)
    assert(r2.getString(1) == "full", r2.toString)
    assert(viewed(cat) == direct(cat))
    // …and a dim-only change with NO fact movement still refreshes
    // (the reapply-equal-batch commit at the unchanged fact anchor)
    spark.sql(s"UPDATE $cat.db.dim SET region = 'rY' WHERE rid = 2")
    val r3 = spark.sql(s"CALL $cat.system.refresh_mview('db.rollup')")
      .collect()(0)
    assert(r3.getString(1) == "full", r3.toString)
    assert(viewed(cat) == direct(cat))
    // back to steady state: the NEXT refresh is current, and a fact
    // delta after the re-anchor folds incrementally again
    val r4 = spark.sql(s"CALL $cat.system.refresh_mview('db.rollup')")
      .collect()(0)
    assert(r4.getString(1) == "current", r4.toString)
    spark.sql(s"""INSERT INTO $cat.db.fact
      SELECT id, id % 10, id FROM range(160, 200)""")
    val r5 = spark.sql(s"CALL $cat.system.refresh_mview('db.rollup')")
      .collect()(0)
    assert(r5.getString(1) == "incremental", r5.toString)
    assert(viewed(cat) == direct(cat))
  }

  test("colliding column names across the join disambiguate; measures " +
    "and keys may come from either side") {
    val cat = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.f (id BIGINT, v BIGINT)
      TBLPROPERTIES ('keys'='id')""")
    spark.sql(s"""CREATE TABLE $cat.db.d (id BIGINT, v BIGINT,
        grp BIGINT) TBLPROPERTIES ('keys'='id')""")
    spark.sql(s"INSERT INTO $cat.db.d SELECT id, id * 100, id % 2 FROM range(5)")
    spark.sql(s"INSERT INTO $cat.db.f SELECT id, id FROM range(40)")
    // f.v and d.v collide; sum over BOTH sides; key from the dim
    spark.sql(s"""CALL $cat.system.create_mview_sql('db.both', sql =>
      "SELECT d.grp, sum(f.v) AS fv, sum(d.v) AS dv, count(*) AS n
       FROM $cat.db.f f JOIN $cat.db.d d ON f.v % 5 = d.id
       GROUP BY d.grp")""")
    def want = spark.sql(s"""SELECT d.grp, sum(f.v) AS fv,
        sum(d.v) AS dv, count(*) AS n
      FROM $cat.db.f f JOIN $cat.db.d d ON f.v % 5 = d.id
      GROUP BY d.grp""").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    def got = spark.sql(s"SELECT grp, fv, dv, n FROM $cat.db.both")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == want)
    spark.sql(s"INSERT INTO $cat.db.f SELECT id, id + 1 FROM range(40, 70)")
    val r = spark.sql(s"CALL $cat.system.refresh_mview('db.both')")
      .collect()(0)
    assert(r.getString(1) == "incremental", r.toString)
    assert(got == want)
  }

  test("LEFT OUTER: unmatched fact rows keep their group; an unmatched " +
    "delta with a null dim KEY falls back to full honestly") {
    val cat = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.f (id BIGINT, rid BIGINT,
        v BIGINT) TBLPROPERTIES ('keys'='id')""")
    spark.sql(s"""CREATE TABLE $cat.db.d (rid BIGINT, tag STRING)
      TBLPROPERTIES ('keys'='rid')""")
    spark.sql(s"INSERT INTO $cat.db.d SELECT id, concat('t', CAST(id AS STRING)) FROM range(3)")
    spark.sql(s"INSERT INTO $cat.db.f SELECT id, id % 6, id FROM range(30)")
    // group by the FACT key, aggregate a dim column's count: left rows
    // without a dim match contribute n but not tagged
    spark.sql(s"""CALL $cat.system.create_mview_sql('db.lo', sql =>
      "SELECT f.rid, count(*) AS n, count(d.tag) AS tagged
       FROM $cat.db.f f LEFT JOIN $cat.db.d d ON f.rid = d.rid
       GROUP BY f.rid")""")
    def want = spark.sql(s"""SELECT f.rid, count(*) AS n,
        count(d.tag) AS tagged
      FROM $cat.db.f f LEFT JOIN $cat.db.d d ON f.rid = d.rid
      GROUP BY f.rid""").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def got = spark.sql(s"SELECT rid, n, tagged FROM $cat.db.lo")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    // fact-side inserts (group key is a FACT column — never null here)
    // fold incrementally even when the dim side has no match
    spark.sql(s"INSERT INTO $cat.db.f SELECT id, id % 7, id FROM range(30, 55)")
    val r = spark.sql(s"CALL $cat.system.refresh_mview('db.lo')")
      .collect()(0)
    assert(r.getString(1) == "incremental", r.toString)
    assert(got == want)
  }

  test("grammar rejections: RIGHT JOIN, filtered dim subquery, " +
    "cross-catalog dim — all loud, nothing created") {
    val cat = freshCatalog()
    seed(cat)
    def rejects(sql: String, needle: String): Unit = {
      val e = intercept[Exception] {
        spark.sql(s"""CALL $cat.system.create_mview_sql('db.bad',
          sql => "$sql")""").collect()
      }
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    rejects(s"""SELECT d.region, count(*) AS n
      FROM $cat.db.fact f RIGHT JOIN $cat.db.dim d ON f.rid = d.rid
      GROUP BY d.region""", "unsupported join type")
    rejects(s"""SELECT d.region, count(*) AS n
      FROM $cat.db.fact f JOIN
        (SELECT * FROM $cat.db.dim WHERE rid > 2) d ON f.rid = d.rid
      GROUP BY d.region""", "dimension")
    // nothing half-created by the rejections
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.db.bad").collect()
    }
    assert(e.getMessage.toLowerCase.contains("table or view not found") ||
      e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"), e.getMessage)
  }

  test("the dim read is version-anchored: a dim write AFTER create is " +
    "invisible until refresh re-anchors") {
    val cat = freshCatalog()
    seed(cat)
    spark.sql(s"""CALL $cat.system.create_mview_sql('db.rollup', sql =>
      "SELECT d.region, sum(f.cents) AS total, count(*) AS n
       FROM $cat.db.fact f JOIN $cat.db.dim d ON f.rid = d.rid
       GROUP BY d.region")""")
    val before = viewed(cat)
    spark.sql(s"UPDATE $cat.db.dim SET region = 'moved' WHERE rid = 0")
    // the VIEW still serves the anchored state (no refresh yet)
    assert(viewed(cat) == before)
    val r = spark.sql(s"CALL $cat.system.refresh_mview('db.rollup')")
      .collect()(0)
    assert(r.getString(1) == "full", r.toString)
    assert(viewed(cat) == direct(cat))
    assert(viewed(cat) != before)
  }
}
