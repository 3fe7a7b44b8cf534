package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Histograms in JOIN estimation (round 14): catalyst's
  * `JoinEstimation` computes equi-join cardinality from the two keys'
  * equi-height histograms when both are present (bin-overlap math) and
  * falls back to `rows·rows / max(ndv)` otherwise. For partially
  * overlapping key ranges the NDV estimate cannot see the overlap
  * fraction — the histogram can, and the tighter intermediate estimate
  * flips the downstream join to broadcast.
  */
class GraftCboJoinHistSpec extends SparkSpec {

  test("partially-overlapping join keys: histogram-based cardinality " +
    "is far tighter than NDV and flips the downstream join") {
    val root = Files.createTempDirectory("graft_cbh").toString
    val cat = s"cbh_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val n = 20000L
    spark.sql(s"""CREATE TABLE $cat.db.a (id BIGINT, k BIGINT)
      TBLPROPERTIES ('keys'='id')""")
    spark.sql(s"""CREATE TABLE $cat.db.b (id BIGINT, k BIGINT)
      TBLPROPERTIES ('keys'='id')""")
    spark.sql(s"""CREATE TABLE $cat.db.c (id BIGINT, w BIGINT)
      TBLPROPERTIES ('keys'='id')""")
    // a.k uniform over [0, 1000); b.k uniform over [990, 1990):
    // ranges overlap 1% but NDV-based estimation prices the full cross
    spark.sql(s"INSERT INTO $cat.db.a SELECT id, id % 1000 FROM range($n)")
    spark.sql(s"INSERT INTO $cat.db.b SELECT id, 990 + id % 1000 FROM range(10000)")
    spark.sql(s"INSERT INTO $cat.db.c SELECT id, id % 7 FROM range(${4 * n})")
    val q = s"""SELECT c.w, count(*) AS cnt FROM $cat.db.a a
      JOIN $cat.db.b b ON a.k = b.k
      JOIN $cat.db.c c ON a.id = c.id
      GROUP BY c.w"""
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    val prevThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (32 * n).toString)
      def joinEstimate(): BigInt = {
        val plan = spark.sql(s"SELECT 1 FROM $cat.db.a a JOIN $cat.db.b b ON a.k = b.k")
          .queryExecution.optimizedPlan
        val j = plan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
        }.head
        j.stats.rowCount.getOrElse(BigInt(-1))
      }
      def bhjCount(): Int =
        "BroadcastHashJoin".r.findAllIn(
          spark.sql(q).queryExecution.executedPlan.toString).length
      spark.sql(s"CALL $cat.system.analyze('db.a', histogram_bins => 0)")
      spark.sql(s"CALL $cat.system.analyze('db.b', histogram_bins => 0)")
      spark.sql(s"CALL $cat.system.analyze('db.c', histogram_bins => 0)")
      val estNdv = joinEstimate()
      val bhjNdv = bhjCount()
      spark.sql(s"CALL $cat.system.analyze('db.a', histogram_bins => 64)")
      spark.sql(s"CALL $cat.system.analyze('db.b', histogram_bins => 64)")
      val estHist = joinEstimate()
      val bhjHist = bhjCount()
      val actual = spark.sql(
        s"SELECT count(*) FROM $cat.db.a a JOIN $cat.db.b b ON a.k = b.k")
        .collect()(0).getLong(0)
      info(s"actual=$actual ndvEst=$estNdv histEst=$estHist " +
        s"bhjNdv=$bhjNdv bhjHist=$bhjHist")
      assert(estHist > 0 && estNdv > 0)
      assert(estHist * 8 <= estNdv,
        s"histogram join estimate ($estHist) must be far tighter than " +
          s"NDV ($estNdv); actual $actual")
      assert(bhjHist > bhjNdv,
        s"the tighter intermediate estimate must flip the downstream " +
          s"join to broadcast (ndv plan: $bhjNdv BHJs, hist plan: $bhjHist)")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
    }
  }
}
