package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** HIDDEN PARTITIONING (round 11, the Iceberg transform vocabulary
  * over the synthetic-partition machinery): `PARTITIONED BY
  * (days(ts))`, `bucket(n, k)`, `truncate(w, s)`, calendar
  * years/months/hours — the table derives the partition value ITSELF
  * on every write path, queries never see or provide it, and the
  * transforms persist in the meta sidecar so a reopened table routes
  * identically. Mutations (keyed upserts, UPDATE, DELETE) re-derive,
  * so replace-semantics rewrites stay exact under any transform.
  */
class GraftHiddenPartitionSpec extends SparkSpec {

  private def freshCatalog(): (String, String) = {
    val root = Files.createTempDirectory("graft_hp").toString
    val cat = s"ghp_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def partDirs(root: String, t: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    Files.list(java.nio.file.Paths.get(s"$root/db/$t")).iterator().asScala
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("__gp="))
      .map(_.getFileName.toString).toSet
  }

  test("days(ts): directories are day-rendered, the column is hidden, " +
    "mutations re-derive, transforms survive reopen") {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.d (k BIGINT, v BIGINT, ts TIMESTAMP)
      PARTITIONED BY (days(ts)) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.d (k, v, ts) VALUES
      (1, 10, TIMESTAMP '2024-03-01 10:00:00'),
      (2, 20, TIMESTAMP '2024-03-01 23:59:59'),
      (3, 30, TIMESTAMP '2024-03-02 00:00:01')""")
    assert(partDirs(root, "d") ==
      Set("__gp=2024-03-01", "__gp=2024-03-02"))
    // the synthetic column never surfaces
    assert(spark.sql(s"SELECT * FROM $cat.db.d").schema.fieldNames.toSeq ==
      Seq("k", "v", "ts"))
    // mutations re-derive: UPDATE rewrites inside the right day
    spark.sql(s"UPDATE $cat.db.d SET v = v + 1 WHERE k = 2")
    spark.sql(s"DELETE FROM $cat.db.d WHERE k = 3")
    assert(spark.sql(s"SELECT k, v FROM $cat.db.d").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet ==
      Set(1L -> 10L, 2L -> 21L))
    // reopen through the sidecar: same derivation (no new day dirs for
    // an existing day)
    val m = graft.operators.GraftTableMeta.read(s"$root/db/d").get
    assert(m.partitionXform == Seq("days"))
    spark.sql(s"""INSERT INTO $cat.db.d (k, v, ts) VALUES
      (9, 90, TIMESTAMP '2024-03-01 12:00:00')""")
    // no NEW directory: the reopened derivation matched (the deleted
    // day's dir lingers physically until vacuum — manifest-level drop)
    assert(partDirs(root, "d") ==
      Set("__gp=2024-03-01", "__gp=2024-03-02"))
    // DESCRIBE surface names the transform
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.db.d").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("partitioning") == "hidden(days(ts))")
    // SHOW CREATE TABLE round-trips the transform spelling
    val ddl = spark.sql(s"SHOW CREATE TABLE $cat.db.d")
      .collect()(0).getString(0)
    assert(ddl.contains("PARTITIONED BY (days(ts))"), ddl)
  }

  test("bucket(8, k) routes into at most 8 stable directories; " +
    "composed days+bucket transforms form one path level") {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.b (k BIGINT, v BIGINT)
      PARTITIONED BY (bucket(8, k)) TBLPROPERTIES ('keys'='k')""")
    spark.range(0, 500).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("hp_src")
    spark.sql(s"INSERT INTO $cat.db.b (k, v) SELECT k, v FROM hp_src")
    val dirs = partDirs(root, "b")
    assert(dirs.size <= 8 && dirs.size >= 4) // murmur3 spreads 500 keys
    assert(dirs.forall(_.matches("__gp=[0-7]")))
    // re-insert of the same keys creates no new directories
    spark.sql(s"INSERT INTO $cat.db.b (k, v) SELECT k, v + 1 FROM hp_src")
    assert(partDirs(root, "b") == dirs)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.b")
      .collect()(0).getLong(0) == 1000L)

    spark.sql(s"""CREATE TABLE $cat.db.c (k BIGINT, ts TIMESTAMP, s STRING)
      PARTITIONED BY (days(ts), bucket(2, k)) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.c (k, ts, s) VALUES
      (1, TIMESTAMP '2024-05-05 01:00:00', 'x')""")
    val c = partDirs(root, "c")
    assert(c.size == 1 && c.head.startsWith("__gp=2024-05-05"))
  }

  test("truncate(w) prefixes strings and floors integrals; null " +
    "sources route to a stable null slot; bad transforms reject") {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.t (k BIGINT, s STRING)
      PARTITIONED BY (truncate(3, s)) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.t (k, s) VALUES
      (1, 'abcdef'), (2, 'abcxyz'), (3, 'zz'), (4, NULL)""")
    val dirs = partDirs(root, "t")
    assert(dirs.exists(_.startsWith("__gp=abc")) &&
      dirs.exists(_.startsWith("__gp=zz")))
    assert(dirs.size == 3) // abc, zz, null slot
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t")
      .collect()(0).getLong(0) == 4L)

    // integral truncate floors to the width grid
    spark.sql(s"""CREATE TABLE $cat.db.ti (k BIGINT, n BIGINT)
      PARTITIONED BY (truncate(100, n)) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"INSERT INTO $cat.db.ti (k, n) VALUES (1, 7), (2, 101), (3, 199)")
    assert(partDirs(root, "ti") == Set("__gp=0", "__gp=100"))

    // truncate on a non-string/integral column rejects at first write
    spark.sql(s"""CREATE TABLE $cat.db.bad (k BIGINT, d DOUBLE)
      PARTITIONED BY (truncate(2, d)) TBLPROPERTIES ('keys'='k')""")
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.db.bad (k, d) VALUES (1, 1.5)")
    }
  }

  test("deletion vectors match their files under URI-escapable " +
    "partition names — hidden multi-transform dirs AND plain values " +
    "with spaces/percents (regression: __dvf stayed URI-encoded)") {
    val (cat, root) = freshCatalog()
    // hidden multi-transform: the composed dir name contains 
    // (escaped %01 on disk, %2501 in the file_path URI)
    spark.sql(s"""CREATE TABLE $cat.db.m (k BIGINT, a BIGINT, u BIGINT,
        ts TIMESTAMP)
      PARTITIONED BY (days(ts), bucket(4, u)) TBLPROPERTIES ('keys'='k')""")
    spark.range(0, 60).selectExpr("id AS k", "id AS a", "id % 5 AS u",
      "timestamp_seconds(1700000000 + id * 86400) AS ts")
      .createOrReplaceTempView("uri_src")
    spark.sql(s"INSERT INTO $cat.db.m (k, a, u, ts) " +
      "SELECT k, a, u, ts FROM uri_src")
    spark.sql(s"DELETE FROM $cat.db.m WHERE a % 13 = 0") // DV commit
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.m")
      .collect()(0).getLong(0) == 55L) // 60 - {0,13,26,39,52}
    val t = graft.operators.GraftTableMeta.open(spark, s"$root/db/m").get
    assert(t.hasDeletionVectorsAt(t.currentVersion))
    assert(t.read.count() == 55L) // Scala path agrees bit-for-bit

    // plain physical partitioning with a SPACE in the value — the
    // pre-existing class of the same bug
    spark.sql(s"""CREATE TABLE $cat.db.sp (k BIGINT, v BIGINT, day STRING)
      PARTITIONED BY (day) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.sp (k, v, day) VALUES
      (1, 7, 'day one'), (2, 13, 'day one'), (3, 21, 'two%01')""")
    spark.sql(s"DELETE FROM $cat.db.sp WHERE v % 7 = 0") // k=1, k=3
    assert(spark.sql(s"SELECT k FROM $cat.db.sp").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
  }
}
