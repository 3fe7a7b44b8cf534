package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Cross-feature compositions of the round-12 surfaces — the places
  * composition bugs hide:
  *
  *   - schema evolution × CDC feed (`__changes` emits the evolved
  *     column; pre-evolution rows project null);
  *   - schema evolution × metadata aggregates (count stays
  *     metadata-only; extrema on the evolved column decline on
  *     stats-free old files rather than lying);
  *   - schema evolution × zone-map pruning (stats columns keep
  *     pruning across the evolution);
  *   - views × time travel (a view whose SQL pins VERSION AS OF);
  *   - ANALYZE × column rename (stale by-name stats stop feeding,
  *     nothing breaks);
  *   - SHOW PARTITIONS × time travel semantics (listing is the LIVE
  *     set; the dropped partition's history stays readable).
  */
class GraftR12CompositionSpec extends SparkSpec {

  private def freshCatalog(): (String, String) = {
    val root = Files.createTempDirectory("graft_r12c").toString
    val cat = s"gr12c_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  test("schema evolution x CDC: __changes emits the evolved column, " +
    "pre-evolution change rows project null") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.c (k BIGINT, v BIGINT, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"INSERT INTO $cat.db.c (k, v, pk) VALUES (1, 10, 0), (2, 20, 1)")
    spark.range(2, 4).selectExpr("id AS k", "id*10 AS v", "id % 2 AS pk",
      "concat('n', id) AS note").createOrReplaceTempView("r12c_src")
    spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.db.c t
      USING r12c_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET note = s.note
      WHEN NOT MATCHED THEN INSERT *""")
    val changes = spark.sql(s"""SELECT k, note, _change_type
      FROM $cat.db.c__changes VERSION AS OF 1""").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("-"),
        r.getString(2)))
    // batch CDC since v1 (the create) replays: inserts of batch 1 (null note via the
    // merge rewrite they may re-land), the merge's effects with notes
    assert(changes.exists(c => c._1 == 3L && c._2 == "n3" && c._3 == "insert"),
      s"evolved column must flow through the CDC feed, got ${changes.toSeq}")
    assert(changes.exists(c => c._1 == 1L && c._2 == "-"),
      s"pre-evolution rows must project null in the feed, got ${changes.toSeq}")
  }

  test("schema evolution x metadata aggregates: count(*) stays " +
    "metadata-only; extrema on the evolved column stay EXACT (declining " +
    "to a scan when old files lack stats)") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.m (k BIGINT, v BIGINT, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k', 'statsCols'='v')""")
    spark.sql(s"INSERT INTO $cat.db.m (k, v, pk) VALUES (1, 10, 0), (2, 20, 1)")
    spark.sql(s"ALTER TABLE $cat.db.m ADD COLUMNS (w BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.m (k, v, pk, w) VALUES (3, 30, 0, 7)")
    def planOf(sql: String) =
      spark.sql(sql).queryExecution.executedPlan.toString
    val cnt = s"SELECT count(*) AS c FROM $cat.db.m"
    assert(planOf(cnt).contains("LocalTableScan"),
      "count(*) must stay metadata-only after evolution")
    assert(spark.sql(cnt).collect()(0).getLong(0) == 3L)
    // extrema on the evolved column: whatever the plan, the ANSWER is
    // exact (null rows from pre-evolution files must not poison it)
    val mm = spark.sql(
      s"SELECT min(w) AS mn, max(w) AS mx, count(w) AS c FROM $cat.db.m")
      .collect()(0)
    assert(mm.getLong(0) == 7L && mm.getLong(1) == 7L && mm.getLong(2) == 1L)
  }

  test("schema evolution x zone-map pruning: stats columns keep " +
    "file-pruning across an evolution commit") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.z (k BIGINT, v BIGINT, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k', 'statsCols'='v')""")
    spark.sql(s"""INSERT INTO $cat.db.z (k, v, pk)
      SELECT id, id * 10, id % 2 FROM range(100)""")
    spark.sql(s"ALTER TABLE $cat.db.z ADD COLUMNS (note STRING)")
    spark.sql(s"""INSERT INTO $cat.db.z (k, v, pk, note)
      SELECT id, id * 10, id % 2, 'x' FROM range(100, 200)""")
    val before = org.apache.spark.sql.graft.GraftSqlRead.lastPlannedFiles.get()
    val n = spark.sql(s"SELECT count(*) FROM $cat.db.z WHERE v >= 1500")
      .collect()(0).getLong(0)
    assert(n == 50L)
    val planned = org.apache.spark.sql.graft.GraftSqlRead.lastPlannedFiles.get()
    val total = org.apache.spark.sql.graft.GraftSqlRead.lastTotalFiles.get()
    assert(planned < total,
      s"zone maps must keep pruning after evolution ($planned/$total)")
  }

  test("views x time travel: a view pinning VERSION AS OF reads the " +
    "pinned snapshot while the live table moves on") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.t (k BIGINT, v BIGINT, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"INSERT INTO $cat.db.t (k, v, pk) VALUES (1, 10, 0), (2, 20, 1)")
    spark.sql(s"""CALL $cat.system.create_view('db.snap',
      'SELECT k, v FROM $cat.db.t VERSION AS OF 2')""")
    spark.sql(s"INSERT INTO $cat.db.t (k, v, pk) VALUES (3, 30, 0)")
    spark.sql(s"DELETE FROM $cat.db.t WHERE k = 1")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.snap").collect()(0)
      .getLong(0) == 2L, "the view must keep reading the pinned version")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t").collect()(0)
      .getLong(0) == 2L)
  }

  test("ANALYZE x RENAME COLUMN: stale by-name stats stop feeding the " +
    "renamed column; re-analyze restores them") {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.a (k BIGINT, v BIGINT, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.a (k, v, pk)
      SELECT id, id, id % 2 FROM range(100)""")
    spark.sql(s"CALL $cat.system.analyze('db.a')")
    spark.sql(s"ALTER TABLE $cat.db.a RENAME COLUMN v TO cents")
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val qe = spark.sql(s"SELECT cents FROM $cat.db.a WHERE cents < 5")
        .queryExecution
      val stats = qe.optimizedPlan.collectLeaves()
        .flatMap(_.stats.attributeStats.toSeq).map(_._1.name).toSet
      assert(!stats.contains("cents"),
        s"stale stats must not feed the RENAMED column by the old name: $stats")
      assert(qe.toRdd != null) // plans + runs fine
      spark.sql(s"CALL $cat.system.analyze('db.a')")
      val stats2 = spark.sql(s"SELECT cents FROM $cat.db.a WHERE cents < 5")
        .queryExecution.optimizedPlan.collectLeaves()
        .flatMap(_.stats.attributeStats.toSeq).map(_._1.name).toSet
      assert(stats2.contains("cents"),
        s"re-analyze must feed the new name: $stats2")
    } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
    val gt = graft.operators.GraftTableMeta.open(spark, s"$root/db/a").get
    assert(gt.tableStats.get.cols.contains("cents"))
  }

  test("SHOW PARTITIONS x time travel: the listing tracks the LIVE " +
    "manifest; the dropped partition's rows stay readable via AS OF") {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.p (k BIGINT, v BIGINT, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.p (k, v, pk) VALUES
      (1, 10, 0), (2, 20, 1), (3, 30, 2)""")
    val gt = graft.operators.GraftTableMeta.open(spark, s"$root/db/p").get
    val v0 = gt.currentVersion
    spark.sql(s"ALTER TABLE $cat.db.p DROP PARTITION (pk=1)")
    assert(spark.sql(s"SHOW PARTITIONS $cat.db.p").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("pk=0", "pk=2"))
    assert(spark.sql(
      s"SELECT v FROM $cat.db.p VERSION AS OF $v0 WHERE pk = 1")
      .collect()(0).getLong(0) == 20L)
  }
}
