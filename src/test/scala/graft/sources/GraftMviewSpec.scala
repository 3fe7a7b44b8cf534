package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Materialized views with incremental refresh (round 12 capstone —
  * composes the CDC change rows, the txn-marked MERGE, the Incremental
  * algebraic state and the persisted-view surface):
  *
  *   - insert-only base changes fold INCREMENTALLY (mode reported);
  *   - deletes/updates in range trigger ONE full recompute + sync
  *     (vanished groups leave the state via NOT MATCHED BY SOURCE);
  *   - the refresh anchor is the state table's txn marker — atomic
  *     with the state mutation, so a replayed refresh SKIPS instead of
  *     double-counting;
  *   - the view surface reads the finish (n_rows / sum_* / avg_*).
  */
class GraftMviewSpec extends SparkSpec {

  private def freshCatalog(): (String, String) = {
    val root = Files.createTempDirectory("graft_mv").toString
    val cat = s"gmv_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def agg(cat: String): Map[Long, (Long, Double)] =
    spark.sql(s"SELECT user_id, n_rows, sum_cents FROM $cat.db.spend")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  private def expected(cat: String): Map[Long, (Long, Double)] =
    spark.sql(s"""SELECT user_id, count(*) AS n,
        CAST(sum(cents) AS DOUBLE) AS s
      FROM $cat.db.ev GROUP BY user_id""").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("create → incremental refresh → full refresh after an update; " +
    "replayed/no-op refreshes skip; vanished groups leave the state") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.ev (k BIGINT, user_id BIGINT,
        cents BIGINT, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.ev (k, user_id, cents, pk)
      SELECT id, id % 5, id * 10, id % 2 FROM range(100)""")
    val created = spark.sql(s"""CALL $cat.system.create_mview('db.spend',
      base => 'db.ev', keys => 'user_id', measures => 'cents')""")
      .collect()(0)
    assert(created.getLong(2) == 5L)
    assert(agg(cat) == expected(cat))

    // insert-only delta (new groups + existing groups) → INCREMENTAL
    spark.sql(s"""INSERT INTO $cat.db.ev (k, user_id, cents, pk)
      SELECT id, id % 7, id, id % 2 FROM range(100, 160)""")
    val r1 = spark.sql(s"CALL $cat.system.refresh_mview('db.spend')")
      .collect()(0)
    assert(r1.getString(1) == "incremental", r1.toString)
    assert(agg(cat) == expected(cat))

    // a no-op refresh reports current and changes nothing
    val r2 = spark.sql(s"CALL $cat.system.refresh_mview('db.spend')")
      .collect()(0)
    assert(r2.getString(1) == "current")
    assert(agg(cat) == expected(cat))

    // an UPDATE in range → full recompute, still exact
    spark.sql(s"UPDATE $cat.db.ev SET cents = cents + 1 WHERE k % 10 = 0")
    val r3 = spark.sql(s"CALL $cat.system.refresh_mview('db.spend')")
      .collect()(0)
    assert(r3.getString(1) == "full", r3.toString)
    assert(agg(cat) == expected(cat))

    // a DELETE that removes an entire group → the group leaves the state
    spark.sql(s"DELETE FROM $cat.db.ev WHERE user_id = 6")
    val r4 = spark.sql(s"CALL $cat.system.refresh_mview('db.spend')")
      .collect()(0)
    assert(r4.getString(1) == "full")
    val m = agg(cat)
    assert(!m.contains(6L) && m == expected(cat))
  }

  test("null semantics: an all-NULL-measure delta keeps SUM/AVG exact " +
    "(SQL semantics — NULLs excluded, NULL only when no value exists); " +
    "a NULL group key in the delta forces the full sync (no duplicate " +
    "state rows)") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.ev (k BIGINT, user_id BIGINT,
        cents BIGINT, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.ev (k, user_id, cents, pk) VALUES
      (1, 1, 10, 0), (2, 2, CAST(NULL AS BIGINT), 1), (3, NULL, 5, 0)""")
    spark.sql(s"""CALL $cat.system.create_mview('db.spend',
      base => 'db.ev', keys => 'user_id', measures => 'cents')""")
    // delta: all-NULL measure for existing group 1 (must NOT poison the
    // running sum), plus another NULL-key row (forces full sync)
    spark.sql(s"""INSERT INTO $cat.db.ev (k, user_id, cents, pk) VALUES
      (4, 1, CAST(NULL AS BIGINT), 0), (5, NULL, 7, 1)""")
    val r = spark.sql(s"CALL $cat.system.refresh_mview('db.spend')")
      .collect()(0)
    assert(r.getString(1) == "full",
      s"a NULL group key in the delta must force the full sync, got $r")
    val rows = spark.sql(s"""SELECT user_id, n_rows, sum_cents, avg_cents
      FROM $cat.db.spend""").collect()
      .map(r => (Option(if (r.isNullAt(0)) null else r.getLong(0)),
        r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    assert(rows == Set(
      (Option(1L), 2L, Some(10.0), Some(10.0)),  // NULL excluded from agg
      (Option(2L), 1L, None, None),              // no value → NULL sum/avg
      (Option.empty[Long], 2L, Some(12.0), Some(6.0))), // ONE null group
      s"got $rows")
    // a later insert-only delta without null keys folds incrementally
    // and the all-NULL-sum group heals arithmetic (10 + 2 = 12)
    spark.sql(s"""INSERT INTO $cat.db.ev (k, user_id, cents, pk) VALUES
      (6, 1, 2, 0), (7, 2, 4, 1)""")
    val r2 = spark.sql(s"CALL $cat.system.refresh_mview('db.spend')")
      .collect()(0)
    assert(r2.getString(1) == "incremental", r2.toString)
    val after = spark.sql(s"""SELECT user_id, sum_cents, avg_cents
      FROM $cat.db.spend WHERE user_id IS NOT NULL ORDER BY user_id""")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(after == Seq((1L, 12.0, 6.0), (2L, 4.0, 4.0)), s"got $after")
  }

  test("guards: missing base column rejects; the state table refuses a " +
    "second create; avg derives exactly from the decimal state") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.ev (k BIGINT, user_id BIGINT,
        cents BIGINT, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.ev (k, user_id, cents, pk)
      VALUES (1, 1, 10, 0), (2, 1, 11, 1), (3, 2, 7, 0)""")
    intercept[Throwable] {
      spark.sql(s"""CALL $cat.system.create_mview('db.bad',
        base => 'db.ev', keys => 'user_id', measures => 'nope')""")
    }
    spark.sql(s"""CALL $cat.system.create_mview('db.spend',
      base => 'db.ev', keys => 'user_id', measures => 'cents')""")
    intercept[Throwable] {
      spark.sql(s"""CALL $cat.system.create_mview('db.spend',
        base => 'db.ev', keys => 'user_id', measures => 'cents')""")
    }
    val rows = spark.sql(
      s"SELECT user_id, n_rows, avg_cents FROM $cat.db.spend ORDER BY user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows == Seq((1L, 2L, 10.5), (2L, 1L, 7.0)))
    // drop_mview removes BOTH the view and the state table; a recreate
    // then works
    assert(spark.sql(s"CALL $cat.system.drop_mview('db.spend')")
      .collect()(0).getBoolean(1))
    intercept[Throwable] { spark.sql(s"SELECT * FROM $cat.db.spend").collect() }
    intercept[Throwable] {
      spark.sql(s"SELECT * FROM $cat.db.spend_state").collect()
    }
    spark.sql(s"""CALL $cat.system.create_mview('db.spend',
      base => 'db.ev', keys => 'user_id', measures => 'cents')""")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.spend").collect()(0)
      .getLong(0) == 2L)
  }
}
