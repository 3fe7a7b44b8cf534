package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.GraftTable

/** INSERT OVERWRITE depth (round 11): all three SQL shapes over a
  * graft catalog table — whole-table, STATIC `PARTITION (p = v)`
  * (replaceWhere-validated partition replacement), and DYNAMIC
  * partition overwrite (`partitionOverwriteMode=dynamic`, a real V2
  * staged write). Untouched partitions stay byte-identical; every
  * shape is one atomic commit with history intact.
  */
class GraftOverwriteSpec extends SparkSpec {

  private def freshCatalog(): (String, String) = {
    val root = Files.createTempDirectory("graft_ovw").toString
    val cat = s"govw_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def dataFilesWithMtimes(dir: String): Map[String, Long] = {
    val root = java.nio.file.Paths.get(dir)
    val out = scala.collection.mutable.Map.empty[String, Long]
    Files.walk(root).forEach { p =>
      val rel = root.relativize(p).toString
      if (Files.isRegularFile(p) && !rel.startsWith("_graft") &&
        rel.endsWith(".parquet"))
        out(rel) = Files.getLastModifiedTime(p).toMillis
    }
    out.toMap
  }

  private def seed(cat: String): Unit = {
    spark.sql(s"""CREATE TABLE $cat.db.t (k BIGINT, v BIGINT, day STRING)
      PARTITIONED BY (day) TBLPROPERTIES ('keys'='k', 'statsCols'='v')""")
    spark.sql(s"""INSERT INTO $cat.db.t (k, v, day) VALUES
      (1, 10, 'd1'), (2, 20, 'd1'), (3, 30, 'd2'), (4, 40, 'd3')""")
  }

  private def rows(cat: String): Set[(Long, Long, String)] =
    spark.sql(s"SELECT k, v, day FROM $cat.db.t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("static PARTITION (day='d1') overwrite replaces exactly that " +
    "partition; others byte-identical; one commit; time travel intact") {
    val (cat, root) = freshCatalog()
    seed(cat)
    val t = graft.operators.GraftTableMeta.open(spark, s"$root/db/t").get
    val v0 = t.currentVersion
    val before = dataFilesWithMtimes(s"$root/db/t")
    spark.sql(s"""INSERT OVERWRITE $cat.db.t PARTITION (day = 'd1')
      SELECT k, v * 100 FROM $cat.db.t VERSION AS OF $v0 WHERE day = 'd1'""")
    assert(rows(cat) == Set((1L, 1000L, "d1"), (2L, 2000L, "d1"),
      (3L, 30L, "d2"), (4L, 40L, "d3")))
    val after = dataFilesWithMtimes(s"$root/db/t")
    val untouched = before.filterNot(_._1.startsWith("day=d1"))
    assert(untouched.forall { case (f, m) => after.get(f).contains(m) })
    assert(t.currentVersion == v0 + 1)
    // pre-overwrite state stays time-travelable
    val old = spark.sql(
      s"SELECT v FROM $cat.db.t VERSION AS OF $v0 WHERE day = 'd1'")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(old == Seq(10L, 20L))
  }

  test("dynamic partitionOverwriteMode replaces exactly the touched " +
    "partitions through the staged V2 write; staging reclaimed") {
    val (cat, root) = freshCatalog()
    seed(cat)
    val t = graft.operators.GraftTableMeta.open(spark, s"$root/db/t").get
    val v0 = t.currentVersion
    val before = dataFilesWithMtimes(s"$root/db/t")
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // touches d1 and d2 only — d3 must survive wholesale
      spark.sql(s"""INSERT OVERWRITE $cat.db.t
        SELECT k + 100, v + 5, day FROM $cat.db.t VERSION AS OF $v0
        WHERE day IN ('d1', 'd2')""")
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    assert(rows(cat) == Set((101L, 15L, "d1"), (102L, 25L, "d1"),
      (103L, 35L, "d2"), (4L, 40L, "d3")))
    val after = dataFilesWithMtimes(s"$root/db/t")
    val untouched = before.filter(_._1.startsWith("day=d3"))
    assert(untouched.nonEmpty)
    assert(untouched.forall { case (f, m) => after.get(f).contains(m) })
    assert(t.currentVersion == v0 + 1)
    // the staged write's scratch dir is gone after the commit
    val staging = java.nio.file.Paths.get(s"$root/db/t/_graft_staging")
    assert(!Files.exists(staging) ||
      !Files.list(staging).iterator().hasNext ||
      {
        import scala.jdk.CollectionConverters._
        Files.list(staging).iterator().asScala
          .forall(p => !p.getFileName.toString.startsWith("dynov_"))
      })
  }

  test("whole-table INSERT OVERWRITE still replaces everything; " +
    "Scala replaceWhere validation rejects mis-routed rows atomically") {
    val (cat, root) = freshCatalog()
    seed(cat)
    // the session default here is dynamic (GraftSession.tune) — the
    // whole-table semantics need static mode, exactly like Spark's own
    // file sources
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try spark.sql(s"""INSERT OVERWRITE $cat.db.t (k, v, day)
      VALUES (9, 90, 'd9')""")
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    assert(rows(cat) == Set((9L, 90L, "d9")))

    // Scala API: rows outside the static target reject BEFORE landing
    val t = graft.operators.GraftTableMeta.open(spark, s"$root/db/t").get
    val v1 = t.currentVersion
    import spark.implicits._
    val bad = Seq((10L, 100L, "elsewhere")).toDF("k", "v", "day")
    val e = intercept[IllegalArgumentException] {
      t.overwritePartitionValues(Seq(Some("d9")), bad)
    }
    assert(e.getMessage.contains("outside the target"))
    assert(t.currentVersion == v1)
    assert(rows(cat) == Set((9L, 90L, "d9")))
  }

  test("static PARTITION overwrite on a TIMESTAMP partition column " +
    "renders the target value like the write side (regression: java " +
    "toString drift spuriously rejected the statement)") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.ts (k BIGINT, v BIGINT,
      ts TIMESTAMP) PARTITIONED BY (ts) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.ts (k, v, ts) VALUES
      (1, 10, TIMESTAMP '2024-01-01 00:00:00'),
      (2, 20, TIMESTAMP '2024-02-01 00:00:00')""")
    spark.sql(s"""INSERT OVERWRITE $cat.db.ts
      PARTITION (ts = TIMESTAMP '2024-01-01 00:00:00')
      SELECT 9, 90""")
    assert(spark.sql(s"SELECT k, v FROM $cat.db.ts").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet ==
      Set(9L -> 90L, 2L -> 20L))
  }

  test("dynamic overwrite honors CHECK constraints atomically") {
    val (cat, root) = freshCatalog()
    seed(cat)
    spark.sql(s"ALTER TABLE $cat.db.t ADD CONSTRAINT pos CHECK (v > 0)")
    val t = graft.operators.GraftTableMeta.open(spark, s"$root/db/t").get
    val v0 = t.currentVersion
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      intercept[Exception] {
        spark.sql(s"""INSERT OVERWRITE $cat.db.t (k, v, day)
          VALUES (7, -7, 'd1')""")
      }
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    assert(t.currentVersion == v0)
    assert(rows(cat) == Set((1L, 10L, "d1"), (2L, 20L, "d1"),
      (3L, 30L, "d2"), (4L, 40L, "d3")))
  }
}
