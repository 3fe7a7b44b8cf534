package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.graft.GraftSqlRead

import graft.SparkSpec

/** RUNTIME FILTERING / DYNAMIC PARTITION PRUNING (round 11): a graft
  * catalog scan declares its partition column and zone-map/Bloom
  * columns runtime-prunable (`SupportsRuntimeV2Filtering`); when a
  * star join's dimension side materializes, the engine hands the scan
  * the join-key values and the scan re-plans — partition-column values
  * prune whole directories, stats-column values probe the same
  * zone-map/Bloom candidate ladder static predicates use. Results are
  * identical with or without pruning (conservative supersets; the join
  * still filters rows) — only I/O changes.
  */
class GraftRuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog(): (String, String) = {
    val root = Files.createTempDirectory("graft_rtf").toString
    val cat = s"grtf_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  /** Fact table over 8 pk partitions with ascending v; file-backed dims
    * (a LocalRelation folds its filter away before the DPP rule runs).
    */
  private def fixture(): (String, String) = {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.fact (k BIGINT, v BIGINT, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k', 'statsCols'='v')""")
    (0 until 3).foreach { i =>
      spark.range(i * 900, i * 900 + 900)
        .selectExpr("id AS k", "id AS v", "id % 8 AS pk")
        .createOrReplaceTempView("rtf_src")
      spark.sql(s"INSERT INTO $cat.db.fact (k, v, pk) " +
        "SELECT k, v, pk FROM rtf_src")
    }
    Seq((0L, 1), (3L, 1), (1L, 0), (7L, 0)).toDF("dk", "flag")
      .write.mode("overwrite").parquet(s"$root/_dim")
    spark.read.parquet(s"$root/_dim").createOrReplaceTempView("rtf_dim")
    Seq((42L, 1), (1234L, 1), (999999L, 0)).toDF("dv", "flag")
      .write.mode("overwrite").parquet(s"$root/_dimv")
    spark.read.parquet(s"$root/_dimv").createOrReplaceTempView("rtf_dimv")
    (cat, root)
  }

  private def gauges[T](body: => T): (T, Long, Long, Long) = {
    GraftSqlRead.runtimeFilterEvents.set(0)
    GraftSqlRead.lastPlannedFiles.set(-1)
    GraftSqlRead.lastTotalFiles.set(-1)
    val r = body
    (r, GraftSqlRead.runtimeFilterEvents.get,
      GraftSqlRead.lastPlannedFiles.get, GraftSqlRead.lastTotalFiles.get)
  }

  test("join on the partition column: DPP reaches the scan and prunes " +
    "whole directories; rows exact") {
    val (cat, _) = fixture()
    val q = s"""SELECT f.k, f.v FROM $cat.db.fact f
      JOIN rtf_dim d ON f.pk = d.dk WHERE d.flag = 1"""
    val df = spark.sql(q)
    val (rows, events, planned, total) = gauges(df.collect())
    assert(df.queryExecution.executedPlan.toString.contains("dynamicpruning"))
    assert(events >= 1)
    // 2 of 8 partitions survive
    assert(planned > 0 && total > 0 && planned <= total / 4)
    assert(rows.length == 676) // ids 0..2699: 338 ≡0 (mod 8) + 338 ≡3
    assert(rows.forall(r => r.getLong(0) % 8 == 0 || r.getLong(0) % 8 == 3))
  }

  test("join on a zone-mapped column: runtime values probe the " +
    "candidate ladder; pruned-out join column is fine") {
    val (cat, _) = fixture()
    // f.pk is NOT in the output — filterAttributes must only declare
    // columns the pruned scan still carries (regression: the engine
    // errors resolving absent names)
    val q = s"""SELECT f.k FROM $cat.db.fact f
      JOIN rtf_dimv d ON f.v = d.dv WHERE d.flag = 1"""
    val df = spark.sql(q)
    val (rows, events, planned, total) = gauges(df.collect())
    assert(df.queryExecution.executedPlan.toString.contains("dynamicpruning"))
    assert(events >= 1)
    assert(planned > 0 && total > 0 && planned < total / 2)
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(42L, 1234L))
  }

  test("no dimension match prunes everything: zero files planned, " +
    "empty result; deletion vectors compose") {
    val (cat, _) = fixture()
    // only the flag=0 key 999999 joins nothing
    val q = s"""SELECT f.k FROM $cat.db.fact f
      JOIN rtf_dimv d ON f.v = d.dv WHERE d.flag = 0"""
    val (rows, events, planned, _) = gauges(spark.sql(q).collect())
    assert(events >= 1 && planned == 0 && rows.isEmpty)

    // a DV'd fact (row-level delete) keeps runtime pruning exact
    spark.sql(s"DELETE FROM $cat.db.fact WHERE k = 42")
    val q2 = s"""SELECT f.k FROM $cat.db.fact f
      JOIN rtf_dimv d ON f.v = d.dv WHERE d.flag = 1"""
    val (rows2, events2, _, _) = gauges(spark.sql(q2).collect())
    assert(events2 >= 1)
    assert(rows2.map(_.getLong(0)).toSeq == Seq(1234L))
  }
}
