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

  test("bucketed state: an incremental refresh rewrites ONLY the " +
    "buckets holding delta keys — untouched buckets' files are " +
    "byte-identical (same name, same mtime)") {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.ev (k BIGINT, user_id BIGINT,
        cents BIGINT) TBLPROPERTIES ('keys'='k')""")
    // 64 distinct user_ids spread across 8 state buckets
    spark.sql(s"""INSERT INTO $cat.db.ev
      SELECT id, id % 64, id * 10 FROM range(512)""")
    spark.sql(s"""CALL $cat.system.create_mview('db.spend',
      base => 'db.ev', keys => 'user_id', measures => 'cents',
      buckets => 8)""")
    val stateDir = java.nio.file.Paths.get(root, "db", "spend_state")
    def dataFiles(): Map[String, Long] = {
      val out = scala.collection.mutable.Map.empty[String, Long]
      java.nio.file.Files.walk(stateDir).forEach { p =>
        val n = p.getFileName.toString
        if (n.endsWith(".parquet") && !n.startsWith("."))
          out(stateDir.relativize(p).toString) =
            java.nio.file.Files.getLastModifiedTime(p).toMillis
      }
      out.toMap
    }
    val before = dataFiles()
    // the state spreads over >1 bucket directory (real partitioning)
    val bucketsBefore = before.keys.map(_.split('/').head).toSet
    assert(bucketsBefore.size > 1, s"expected >1 bucket, got $bucketsBefore")
    // delta touches ONE existing group key → exactly one bucket rewrites
    spark.sql(s"INSERT INTO $cat.db.ev VALUES (9001, 7, 5)")
    val r = spark.sql(s"CALL $cat.system.refresh_mview('db.spend')")
      .collect()(0)
    assert(r.getString(1) == "incremental", r.toString)
    val after = dataFiles()
    val deltaBucket = spark.sql("SELECT pmod(hash(CAST(7 AS BIGINT)), 8)")
      .collect()(0).get(0).toString
    // every file outside the delta key's bucket survived IDENTICALLY
    val untouchedBefore = before.filterNot(_._1.startsWith(s"__gp=$deltaBucket/"))
    val untouchedAfter = after.filterNot(_._1.startsWith(s"__gp=$deltaBucket/"))
    assert(untouchedBefore == untouchedAfter,
      s"untouched buckets must not rewrite:\n$untouchedBefore\nvs\n$untouchedAfter")
    // the touched bucket DID change (the fold landed)
    assert(before.filter(_._1.startsWith(s"__gp=$deltaBucket/")) !=
      after.filter(_._1.startsWith(s"__gp=$deltaBucket/")))
    // and the view is exact
    assert(agg(cat) == expected(cat))
  }

  test("widened measure algebra: min/max/dcount/filtered measures stay " +
    "exact through BOTH refresh modes; a group with no qualifying rows " +
    "renders NULL for its filtered sum") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.ev (k BIGINT, user_id BIGINT,
        cents BIGINT) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.ev
      SELECT id, id % 4, id * 7 FROM range(40)""")
    spark.sql(s"""CALL $cat.system.create_mview('db.alg',
      base => 'db.ev', keys => 'user_id',
      measures => 'cents, min:cents, max:cents, dcount:cents AS dc,
                   sum:cents WHERE cents % 3 = 0 AS c3')""")
    def check(): Unit = {
      val got = spark.sql(s"""SELECT user_id, n_rows, sum_cents,
          min_cents, max_cents, dcount_dc, sum_c3, avg_c3
        FROM $cat.db.alg""").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getLong(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6)),
          if (r.isNullAt(7)) None else Some(r.getDouble(7)))).toMap
      val want = spark.sql(s"""SELECT user_id, count(*),
          CAST(sum(cents) AS DOUBLE), CAST(min(cents) AS DOUBLE),
          CAST(max(cents) AS DOUBLE), count(DISTINCT cents),
          CAST(sum(CASE WHEN cents % 3 = 0 THEN cents END) AS DOUBLE),
          CAST(avg(CASE WHEN cents % 3 = 0 THEN cents END) AS DOUBLE)
        FROM $cat.db.ev GROUP BY user_id""").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getLong(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6)),
          if (r.isNullAt(7)) None else Some(r.getDouble(7)))).toMap
      assert(got == want, s"got $got\nwant $want")
    }
    check()
    // insert-only delta (low cardinality → the sketch is exact) must
    // fold INCREMENTALLY and stay exact across every measure family
    spark.sql(s"""INSERT INTO $cat.db.ev
      SELECT id, id % 6, id * 5 FROM range(40, 70)""")
    val r1 = spark.sql(s"CALL $cat.system.refresh_mview('db.alg')")
      .collect()(0)
    assert(r1.getString(1) == "incremental", r1.toString)
    check()
    // an UPDATE forces the full recompute (min/max/dcount are not
    // subtractable — exactly what the mode split is for), still exact
    spark.sql(s"UPDATE $cat.db.ev SET cents = cents - 3 WHERE k % 4 = 1")
    val r2 = spark.sql(s"CALL $cat.system.refresh_mview('db.alg')")
      .collect()(0)
    assert(r2.getString(1) == "full", r2.toString)
    check()
    // a group whose rows ALL fail the filter renders NULL for sum_c3:
    // user 99 gets one row with cents % 3 != 0
    spark.sql(s"INSERT INTO $cat.db.ev VALUES (900, 99, 8)")
    spark.sql(s"CALL $cat.system.refresh_mview('db.alg')")
    val u99 = spark.sql(
      s"SELECT sum_c3, dcount_dc FROM $cat.db.alg WHERE user_id = 99")
      .collect()(0)
    assert(u99.isNullAt(0) && u99.getLong(1) == 1L)
  }

  test("refresh_all_mviews: two mviews over one base stay consistent " +
    "through a mixed insert/update tick; a base filter restricts the " +
    "walk; other bases' mviews are untouched") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.ev (k BIGINT, user_id BIGINT,
        cents BIGINT) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""CREATE TABLE $cat.db.other (k BIGINT, v BIGINT)
      TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"INSERT INTO $cat.db.ev SELECT id, id % 5, id FROM range(50)")
    spark.sql(s"INSERT INTO $cat.db.other VALUES (1, 1)")
    spark.sql(s"""CALL $cat.system.create_mview('db.by_user',
      base => 'db.ev', keys => 'user_id', measures => 'cents')""")
    spark.sql(s"""CALL $cat.system.create_mview('db.maxima',
      base => 'db.ev', keys => 'user_id', measures => 'max:cents')""")
    spark.sql(s"""CALL $cat.system.create_mview('db.of_other',
      base => 'db.other', keys => 'k', measures => 'v')""")
    // a mixed tick: insert-only for a while, then an update; the other
    // base moves too (but the base-filtered refresh must not touch it)
    spark.sql(s"INSERT INTO $cat.db.ev SELECT id, id % 7, id FROM range(50, 80)")
    spark.sql(s"UPDATE $cat.db.ev SET cents = cents + 1 WHERE k % 9 = 0")
    spark.sql(s"INSERT INTO $cat.db.other VALUES (2, 2)")
    val rows = spark.sql(
      s"CALL $cat.system.refresh_all_mviews(base => 'db.ev')").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.keySet == Set("db.by_user", "db.maxima"), rows)
    assert(rows.values.forall(_ == "full"), rows) // the UPDATE is in range
    // both views exact against the final base
    val sums = spark.sql(s"SELECT user_id, sum_cents FROM $cat.db.by_user")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val maxes = spark.sql(s"SELECT user_id, max_cents FROM $cat.db.maxima")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = spark.sql(s"""SELECT user_id, CAST(sum(cents) AS DOUBLE),
        CAST(max(cents) AS DOUBLE) FROM $cat.db.ev GROUP BY user_id""")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(want.forall { case (u, s0, m0) =>
      sums(u) == s0 && maxes(u) == m0 }, s"$sums / $maxes")
    // db.other's mview was NOT refreshed by the base-filtered call, so
    // the unfiltered walk finds it still behind (incremental fold);
    // the db.ev views are already current
    val otherRow = spark.sql(
      s"CALL $cat.system.refresh_all_mviews()").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(otherRow ==
      Map("db.by_user" -> "current", "db.maxima" -> "current",
        "db.of_other" -> "incremental"), otherRow)
    assert(spark.sql(s"SELECT sum(sum_v) FROM $cat.db.of_other")
      .collect()(0).getDouble(0) == 3.0)
  }

  test("create_mview_sql: a SELECT-defined mview renders EXACTLY the " +
    "SELECT's columns and stays equal to running it, through both " +
    "refresh modes (WHERE + per-aggregate FILTER + every family)") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.ev (k BIGINT, user_id BIGINT,
        cents BIGINT) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"INSERT INTO $cat.db.ev SELECT id, id % 4, id FROM range(60)")
    val select = s"""SELECT user_id, sum(cents) AS total,
        count(*) AS n, count(cents) AS nc, min(cents) AS lo,
        max(cents) AS hi, avg(cents) AS mean,
        sum(cents) FILTER (WHERE cents % 2 = 0) AS even_total
      FROM $cat.db.ev WHERE cents > 5 GROUP BY user_id"""
    spark.sql(s"""CALL $cat.system.create_mview_sql('db.agg',
      sql => "$select")""")
    def check(): Unit = {
      val view = spark.sql(s"SELECT * FROM $cat.db.agg")
      val direct = spark.sql(select)
      assert(view.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        direct.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"${view.schema} vs ${direct.schema}")
      val a = view.collect().map(_.toSeq).toSet
      val b = direct.collect().map(_.toSeq).toSet
      assert(a == b, s"view $a\nselect $b")
    }
    check()
    spark.sql(s"INSERT INTO $cat.db.ev SELECT id, id % 6, id FROM range(60, 90)")
    val r1 = spark.sql(s"CALL $cat.system.refresh_mview('db.agg')")
      .collect()(0)
    assert(r1.getString(1) == "incremental", r1.toString)
    check()
    spark.sql(s"UPDATE $cat.db.ev SET cents = cents + 1 WHERE k % 7 = 0")
    val r2 = spark.sql(s"CALL $cat.system.refresh_mview('db.agg')")
      .collect()(0)
    assert(r2.getString(1) == "full", r2.toString)
    check()
    // out-of-shape SELECTs reject LOUDLY (never a silently-wrong view)
    def rejects(sql: String, needle: String): Unit = {
      val e = intercept[Exception] {
        spark.sql(s"""CALL $cat.system.create_mview_sql('db.bad',
          sql => "$sql")""")
      }
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    rejects(s"SELECT count(DISTINCT cents) AS d FROM $cat.db.ev GROUP BY user_id",
      "DISTINCT")
    rejects(s"SELECT user_id, sum(cents) + 1 AS x FROM $cat.db.ev GROUP BY user_id",
      "unsupported output expression")
    // joins are SUPPORTED since round 14 (fact ⋈ dims,
    // GraftMviewJoinSpec) — but only left-deep with bare dim tables;
    // a filtered dim subquery still rejects
    rejects(s"SELECT a.user_id, sum(a.cents) AS s FROM $cat.db.ev a JOIN (SELECT * FROM $cat.db.ev WHERE k > 0) b ON a.k = b.k GROUP BY a.user_id",
      "dimension")
    rejects(s"SELECT user_id FROM $cat.db.ev GROUP BY user_id",
      "no aggregate")
    spark.sql(s"""CREATE TABLE $cat.db.fl (k BIGINT, x DOUBLE)
      TBLPROPERTIES ('keys'='k')""")
    rejects(s"SELECT k, sum(x) AS s FROM $cat.db.fl GROUP BY k",
      "INTEGRAL")
    // clock-dependent expressions vary ACROSS refreshes — rejected in
    // WHERE, per-aggregate FILTER and GROUP BY alike
    rejects(s"SELECT user_id, sum(cents) AS s FROM $cat.db.ev WHERE cents > unix_timestamp() GROUP BY user_id",
      "DIFFERENTLY at each refresh")
    rejects(s"SELECT user_id + year(current_date()) AS age, sum(cents) AS s FROM $cat.db.ev GROUP BY user_id + year(current_date())",
      "DIFFERENTLY at each refresh")
  }

  test("create_mview_sql with EXPRESSION group keys (the time-bucketed " +
    "rollup shape): GROUP BY CAST(ts AS DATE)-style derived keys stay " +
    "exact through both refresh modes; unaliased expressions reject") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.ev (k BIGINT, ts TIMESTAMP,
        user_id BIGINT, cents BIGINT) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.ev
      SELECT id, timestamp_seconds(1700000000 + id * 20000), id % 3,
        id * 3 FROM range(60)""")
    val select = s"""SELECT CAST(ts AS DATE) AS day,
        user_id % 2 AS cohort, sum(cents) AS total, count(*) AS n
      FROM $cat.db.ev GROUP BY CAST(ts AS DATE), user_id % 2"""
    spark.sql(s"""CALL $cat.system.create_mview_sql('db.daily',
      sql => "$select")""")
    def check(): Unit = {
      val a = spark.sql(s"SELECT * FROM $cat.db.daily")
      val b = spark.sql(select)
      assert(a.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        b.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"${a.schema} vs ${b.schema}")
      assert(a.collect().map(_.toSeq).toSet == b.collect().map(_.toSeq).toSet)
    }
    check()
    spark.sql(s"""INSERT INTO $cat.db.ev
      SELECT id, timestamp_seconds(1700000000 + id * 20000), id % 5,
        id FROM range(60, 100)""")
    val r1 = spark.sql(s"CALL $cat.system.refresh_mview('db.daily')")
      .collect()(0)
    assert(r1.getString(1) == "incremental", r1.toString)
    check()
    spark.sql(s"UPDATE $cat.db.ev SET cents = cents + 1 WHERE k % 8 = 0")
    val r2 = spark.sql(s"CALL $cat.system.refresh_mview('db.daily')")
      .collect()(0)
    assert(r2.getString(1) == "full", r2.toString)
    check()
    // an UNALIASED grouping expression rejects with guidance
    val e = intercept[Exception] {
      spark.sql(s"""CALL $cat.system.create_mview_sql('db.bad', sql =>
        "SELECT sum(cents) AS s FROM $cat.db.ev GROUP BY CAST(ts AS DATE)")""")
    }
    assert(e.getMessage.contains("ALIASED"), e.getMessage)
    // a derived alias colliding with a base column rejects
    val e2 = intercept[Exception] {
      spark.sql(s"""CALL $cat.system.create_mview_sql('db.bad2', sql =>
        "SELECT CAST(ts AS DATE) AS cents, sum(cents) AS s
         FROM $cat.db.ev GROUP BY CAST(ts AS DATE)")""")
    }
    assert(e2.getMessage.contains("collides"), e2.getMessage)
  }

  test("create_mview_sql with HAVING: the condition filters at READ " +
    "time (groups keep their state and re-emerge when they cross the " +
    "bar), incl. HAVING over an aggregate NOT in the SELECT list") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.ev (k BIGINT, user_id BIGINT,
        cents BIGINT) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"INSERT INTO $cat.db.ev SELECT id, id % 10, id FROM range(30)")
    val select = s"""SELECT user_id, sum(cents) AS total
      FROM $cat.db.ev GROUP BY user_id HAVING count(*) > 3"""
    spark.sql(s"""CALL $cat.system.create_mview_sql('db.big',
      sql => "$select")""")
    def check(): Unit = {
      val a = spark.sql(s"SELECT * FROM $cat.db.big")
      val b = spark.sql(select)
      assert(a.columns.toSeq == b.columns.toSeq,
        s"${a.columns.toSeq} vs ${b.columns.toSeq}")
      assert(a.collect().map(_.toSeq).toSet == b.collect().map(_.toSeq).toSet)
    }
    // 30 rows over 10 users = 3 each → NOBODY crosses count(*) > 3 yet
    assert(spark.sql(s"SELECT * FROM $cat.db.big").collect().isEmpty)
    check()
    // an insert-only delta pushes SOME users over the bar — they
    // re-emerge from state that was maintained all along
    spark.sql(s"INSERT INTO $cat.db.ev SELECT id, id % 4, id FROM range(30, 50)")
    val r1 = spark.sql(s"CALL $cat.system.refresh_mview('db.big')")
      .collect()(0)
    assert(r1.getString(1) == "incremental", r1.toString)
    assert(spark.sql(s"SELECT * FROM $cat.db.big").collect().nonEmpty)
    check()
    // HAVING over a SELECTED aggregate works too
    spark.sql(s"""CALL $cat.system.create_mview_sql('db.big2', sql =>
      "SELECT user_id, count(*) AS n FROM $cat.db.ev
       GROUP BY user_id HAVING n > 3")""")
    val n2 = spark.sql(s"SELECT * FROM $cat.db.big2").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w2 = spark.sql(s"""SELECT user_id, count(*) AS n FROM $cat.db.ev
      GROUP BY user_id HAVING n > 3""").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n2 == w2, s"$n2 vs $w2")
  }

  test("measure spec parsing: duplicate names reject; bad predicate " +
    "fails the CREATE, not the first refresh") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.ev (k BIGINT, user_id BIGINT,
        cents BIGINT) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"INSERT INTO $cat.db.ev VALUES (1, 1, 10)")
    intercept[Throwable] {
      spark.sql(s"""CALL $cat.system.create_mview('db.bad',
        base => 'db.ev', keys => 'user_id',
        measures => 'cents, sum:cents')""") // same (func, name) twice
    }
    intercept[Throwable] {
      spark.sql(s"""CALL $cat.system.create_mview('db.bad2',
        base => 'db.ev', keys => 'user_id',
        measures => 'sum:cents WHERE nope > 1 AS x')""")
    }
    // neither failed create left debris: both names create cleanly now
    spark.sql(s"""CALL $cat.system.create_mview('db.bad',
      base => 'db.ev', keys => 'user_id', measures => 'cents')""")
    spark.sql(s"""CALL $cat.system.create_mview('db.bad2',
      base => 'db.ev', keys => 'user_id',
      measures => 'sum:cents WHERE cents > 1 AS x')""")
    assert(spark.sql(s"SELECT sum_x FROM $cat.db.bad2").collect()(0)
      .getDouble(0) == 10.0)
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
