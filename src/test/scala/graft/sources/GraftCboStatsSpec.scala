package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** ANALYZE → column statistics → cost-based optimizer (round 12):
  * `CALL <cat>.system.analyze` runs ONE distributed pass (HLL NDV,
  * null counts, numeric extrema, string lengths) into the stats
  * sidecar; the SQL scan reports them as V2 column statistics, Spark's
  * `transformV2Stats` lands them in the logical plan's
  * `attributeStats`, and with `spark.sql.cbo.enabled` the filter
  * selectivity estimate FLIPS a real planning decision: a join side
  * too large to broadcast by file size broadcasts once stats prove the
  * filter keeps only a sliver.
  */
class GraftCboStatsSpec extends SparkSpec {

  private def freshCatalog(): (String, String) = {
    val root = Files.createTempDirectory("graft_cbo").toString
    val cat = s"gcbo_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  test("analyze feeds attributeStats (exact row count, NDV, extrema) " +
    "and flips the broadcast decision through filter selectivity") {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.f (k BIGINT, v BIGINT, pad STRING,
        pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k')""")
    spark.range(0, 40000).selectExpr("id AS k", "id % 1000 AS v",
      "repeat('x', 64) AS pad", "id % 4 AS pk")
      .createOrReplaceTempView("cbo_src")
    spark.sql(s"INSERT INTO $cat.db.f (k, v, pad, pk) SELECT * FROM cbo_src")
    spark.sql(s"""CREATE TABLE $cat.db.d (k BIGINT, w BIGINT, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.d (k, w, pk)
      SELECT id, id * 2, id % 4 FROM range(40000)""")
    val q = s"""SELECT count(*) FROM $cat.db.d d JOIN $cat.db.f f
      ON d.k = f.k WHERE f.v < 5"""
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    val prevThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (30 * 1024).toString)
      val before = spark.sql(q).queryExecution
      assert(!before.executedPlan.toString.contains("BroadcastHashJoin"),
        "without stats both sides exceed the threshold — no broadcast")
      assert(before.optimizedPlan.collectLeaves()
        .forall(_.stats.attributeStats.isEmpty))

      val rep = spark.sql(s"CALL $cat.system.analyze('db.f')").collect()(0)
      assert(rep.getLong(2) == 40000L && rep.getInt(3) == 4)
      spark.sql(s"CALL $cat.system.analyze('db.d')")

      val after = spark.sql(q).queryExecution
      val leaves = after.optimizedPlan.collectLeaves()
      assert(leaves.forall(_.stats.rowCount.contains(BigInt(40000))),
        "ANALYZE row counts must reach the logical plan")
      assert(leaves.exists(_.stats.attributeStats.nonEmpty),
        "column stats must reach attributeStats")
      val vStat = leaves.flatMap(_.stats.attributeStats.toSeq)
        .find(_._1.name == "v").map(_._2)
      assert(vStat.exists(s => s.min.contains(0L) && s.max.contains(999L)),
        s"v extrema must be the analyzed 0..999, got $vStat")
      assert(vStat.exists(_.distinctCount.exists(n =>
        n > BigInt(800) && n < BigInt(1200))),
        s"v NDV must be ~1000 (HLL), got $vStat")
      assert(after.executedPlan.toString.contains("BroadcastHashJoin"),
        "the v < 5 selectivity estimate must flip the join to broadcast")
      assert(spark.sql(q).collect()(0).getLong(0) == 200L)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
    }
    // the sidecar is one small file; re-analyzing a column subset works
    val gt = graft.operators.GraftTableMeta.open(spark, s"$root/db/f").get
    val ts = gt.tableStats.get
    assert(ts.rowCount == 40000L && ts.cols("v").nullCount.contains(0L))
    assert(ts.cols("pad").avgLen.contains(64L) &&
      ts.cols("pad").maxLen.contains(64L))
    // integral extrema survive EXACTLY (string-rendered, not a double
    // roundtrip) and surface through CALL show_stats
    assert(ts.cols("k").min.contains("0") &&
      ts.cols("k").max.contains("39999"), ts.cols("k"))
    val shown = spark.sql(s"CALL $cat.system.show_stats('db.f')").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(shown("*").getLong(2) == 40000L)
    assert(shown("v").getString(5) == "0" && shown("v").getString(6) == "999")
    assert(shown("pad").getLong(8) == 64L)
  }

  test("equi-height histograms flip a plan min/max cannot: a skewed " +
    "column's range predicate estimates from bin coverage") {
    val (cat, _) = freshCatalog()
    // SKEW: 99.5% of rows in [0, 99], 0.5% up at ~1e9 — min/max uniform
    // interpolation estimates `c >= 500000` keeps ~everything (no
    // broadcast); the histogram sees the range covered by <1 of 64
    // bins and shrinks the estimate ~64x
    spark.sql(s"""CREATE TABLE $cat.db.f (k BIGINT, c BIGINT, pad STRING,
        pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k')""")
    spark.range(0, 40000).selectExpr("id AS k",
      "CASE WHEN id % 200 = 0 THEN 1000000000 + id ELSE id % 100 END AS c",
      "repeat('x', 64) AS pad", "id % 4 AS pk")
      .createOrReplaceTempView("cbo_skew_src")
    spark.sql(s"INSERT INTO $cat.db.f (k, c, pad, pk) SELECT * FROM cbo_skew_src")
    spark.sql(s"""CREATE TABLE $cat.db.d (k BIGINT, w BIGINT, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.d (k, w, pk)
      SELECT id, id * 2, id % 4 FROM range(40000)""")
    spark.sql(s"CALL $cat.system.analyze('db.d')")
    val q = s"""SELECT count(*) FROM $cat.db.d d JOIN $cat.db.f f
      ON d.k = f.k WHERE f.c >= 500000"""
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    val prevThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (100 * 1024).toString)
      // NDV + extrema, NO histogram: the uniform interpolation keeps
      // ~all 40000 rows — too big to broadcast
      spark.sql(s"CALL $cat.system.analyze('db.f', histogram_bins => 0)")
      val before = spark.sql(q).queryExecution
      assert(!before.executedPlan.toString.contains("BroadcastHashJoin"),
        "min/max alone must NOT see through the skew")
      // re-analyze WITH the histogram: same extrema, same NDV — the
      // bins are the only new fact, and they flip the plan
      spark.sql(s"CALL $cat.system.analyze('db.f', histogram_bins => 64)")
      val after = spark.sql(q).queryExecution
      val cStat = after.optimizedPlan.collectLeaves()
        .flatMap(_.stats.attributeStats.toSeq)
        .find(_._1.name == "c").map(_._2)
      assert(cStat.exists(_.histogram.exists(_.bins.length == 64)),
        s"the 64-bin histogram must reach catalyst ColumnStat, got $cStat")
      assert(after.executedPlan.toString.contains("BroadcastHashJoin"),
        "bin coverage must shrink the skewed-range estimate below the " +
          "broadcast threshold")
      assert(spark.sql(q).collect()(0).getLong(0) == 200L)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
    }
    // the bins surface through CALL show_stats (count + rendering)
    val shown = spark.sql(s"CALL $cat.system.show_stats('db.f')").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(shown("c").getInt(9) == 64)
    assert(shown("c").getString(10).contains(":"))
    assert(shown("pad").isNullAt(9), "non-numeric columns carry no histogram")
    // staleness surfaces: a commit after ANALYZE bumps stale_commits
    assert(shown("*").getLong(11) == 0L)
    spark.sql(s"INSERT INTO $cat.db.f (k, c, pad, pk) VALUES (99999, 1, 'x', 0)")
    val shown2 = spark.sql(s"CALL $cat.system.show_stats('db.f')").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(shown2("*").getLong(11) == 1L,
      "stale_commits must count commits since the stats were computed")
  }
}
