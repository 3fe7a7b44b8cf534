package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Materialized views × base schema evolution (round 14): the explicit
  * contract —
  *
  *   - ADD COLUMN on the base never disturbs a view (both refresh
  *     modes keep folding);
  *   - WIDENING a measure/key column's type (int → bigint) folds
  *     correctly: the measure state is exact decimal and the key MERGE
  *     up-casts, so post-widen values beyond the old range aggregate
  *     exactly;
  *   - DROP/RENAME of a referenced column fails the NEXT refresh
  *     loudly with a message NAMING the view, its definition, and the
  *     action (drop_mview + recreate) — never a silently-wrong view.
  */
class GraftMviewEvolutionSpec extends SparkSpec {

  private def freshCatalog(): String = {
    val root = Files.createTempDirectory("graft_mve").toString
    val cat = s"mve_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  test("ADD COLUMN on the base: both refresh modes keep folding, the " +
    "view is undisturbed") {
    val cat = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.ev (k BIGINT, user_id BIGINT,
        cents BIGINT) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"INSERT INTO $cat.db.ev SELECT id, id % 5, id FROM range(50)")
    spark.sql(s"""CALL $cat.system.create_mview('db.spend',
      base => 'db.ev', keys => 'user_id', measures => 'cents')""")
    spark.sql(s"ALTER TABLE $cat.db.ev ADD COLUMNS (note STRING)")
    spark.sql(s"""INSERT INTO $cat.db.ev
      SELECT id, id % 5, id, concat('n', CAST(id AS STRING))
      FROM range(50, 80)""")
    val r1 = spark.sql(s"CALL $cat.system.refresh_mview('db.spend')")
      .collect()(0)
    assert(r1.getString(1) == "incremental", r1.toString)
    spark.sql(s"UPDATE $cat.db.ev SET cents = cents + 1 WHERE k % 9 = 0")
    val r2 = spark.sql(s"CALL $cat.system.refresh_mview('db.spend')")
      .collect()(0)
    assert(r2.getString(1) == "full", r2.toString)
    val got = spark.sql(s"SELECT user_id, n_rows, sum_cents FROM $cat.db.spend")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val want = spark.sql(s"""SELECT user_id, count(*) AS n,
        CAST(sum(cents) AS DOUBLE) AS s FROM $cat.db.ev GROUP BY user_id""")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == want)
  }

  test("WIDENING a measure column (int -> bigint): post-widen values " +
    "beyond the int range fold exactly") {
    val cat = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.ev (k BIGINT, user_id BIGINT,
        cents INT) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.ev
      SELECT id, id % 3, CAST(id AS INT) FROM range(30)""")
    spark.sql(s"""CALL $cat.system.create_mview('db.spend',
      base => 'db.ev', keys => 'user_id', measures => 'cents, max:cents')""")
    spark.sql(s"ALTER TABLE $cat.db.ev ALTER COLUMN cents TYPE BIGINT")
    // values beyond Int.MaxValue — only exact wide folding gets these
    // right
    spark.sql(s"""INSERT INTO $cat.db.ev
      SELECT id, id % 3, 3000000000 + id FROM range(30, 45)""")
    val r1 = spark.sql(s"CALL $cat.system.refresh_mview('db.spend')")
      .collect()(0)
    assert(r1.getString(1) == "incremental", r1.toString)
    val got = spark.sql(
      s"SELECT user_id, sum_cents, max_cents FROM $cat.db.spend")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val want = spark.sql(s"""SELECT user_id, CAST(sum(cents) AS DOUBLE) AS s,
        CAST(max(cents) AS DOUBLE) AS m FROM $cat.db.ev GROUP BY user_id""")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got == want)
  }

  test("DROP / RENAME of a referenced column: the next refresh fails " +
    "LOUDLY naming the view and the recovery action") {
    val cat = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.ev (k BIGINT, user_id BIGINT,
        cents BIGINT, extra BIGINT) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"INSERT INTO $cat.db.ev SELECT id, id % 5, id, id FROM range(40)")
    spark.sql(s"""CALL $cat.system.create_mview('db.spend',
      base => 'db.ev', keys => 'user_id', measures => 'cents')""")
    // dropping an UNREFERENCED column is harmless
    spark.sql(s"ALTER TABLE $cat.db.ev DROP COLUMN extra")
    spark.sql(s"INSERT INTO $cat.db.ev SELECT id, id % 5, id FROM range(40, 60)")
    assert(spark.sql(s"CALL $cat.system.refresh_mview('db.spend')")
      .collect()(0).getString(1) == "incremental")
    // renaming the MEASURE column breaks the next refresh — loudly
    spark.sql(s"ALTER TABLE $cat.db.ev RENAME COLUMN cents TO pennies")
    spark.sql(s"INSERT INTO $cat.db.ev SELECT id, id % 5, id FROM range(60, 70)")
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.refresh_mview('db.spend')").collect()
    }
    assert(e.getMessage.contains("refresh_mview(db.spend)") &&
      e.getMessage.contains("drop_mview") &&
      e.getMessage.contains("measures [sum:cents AS cents]"),
      e.getMessage)
    // the view itself still serves the LAST refreshed state (stale but
    // never wrong-shaped)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.spend")
      .collect()(0).getLong(0) == 5L)
    // renaming BACK heals without recreate
    spark.sql(s"ALTER TABLE $cat.db.ev RENAME COLUMN pennies TO cents")
    assert(spark.sql(s"CALL $cat.system.refresh_mview('db.spend')")
      .collect()(0).getString(1) == "incremental")
    val got = spark.sql(s"SELECT user_id, sum_cents FROM $cat.db.spend")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = spark.sql(s"""SELECT user_id, CAST(sum(cents) AS DOUBLE) AS s
        FROM $cat.db.ev GROUP BY user_id""")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want)
  }

  test("a DIM schema break names the join view too") {
    val cat = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.f (id BIGINT, rid BIGINT,
        v BIGINT) TBLPROPERTIES ('keys'='id')""")
    spark.sql(s"""CREATE TABLE $cat.db.d (rid BIGINT, tag STRING)
      TBLPROPERTIES ('keys'='rid')""")
    spark.sql(s"INSERT INTO $cat.db.d SELECT id, CAST(id AS STRING) FROM range(5)")
    spark.sql(s"INSERT INTO $cat.db.f SELECT id, id % 5, id FROM range(30)")
    spark.sql(s"""CALL $cat.system.create_mview_sql('db.jr', sql =>
      "SELECT d.tag, sum(f.v) AS total FROM $cat.db.f f
       JOIN $cat.db.d d ON f.rid = d.rid GROUP BY d.tag")""")
    spark.sql(s"ALTER TABLE $cat.db.d RENAME COLUMN tag TO label")
    // the rename is metadata-only (no dim version bump): with no data
    // movement the refresh is honestly 'current'. The break surfaces
    // on the next DATA-driven refresh:
    assert(spark.sql(s"CALL $cat.system.refresh_mview('db.jr')")
      .collect()(0).getString(1) == "current")
    spark.sql(s"INSERT INTO $cat.db.f SELECT id, id % 5, id FROM range(30, 40)")
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.refresh_mview('db.jr')").collect()
    }
    assert(e.getMessage.contains("refresh_mview(db.jr)") &&
      e.getMessage.contains("db.d"), e.getMessage)
  }
}
