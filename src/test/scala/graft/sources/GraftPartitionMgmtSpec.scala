package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Partition management (round 12): `SHOW PARTITIONS` (plain,
  * filtered, hidden layouts), `ALTER TABLE … DROP PARTITION` and
  * `TRUNCATE TABLE … PARTITION` over the `SupportsPartitionManagement`
  * protocol, plus the `<t>__detail` metadata table. All listing is
  * manifest-only (ZERO distributed jobs, asserted with a job
  * listener); drops are one metadata-level overwrite commit with
  * history intact.
  */
class GraftPartitionMgmtSpec extends SparkSpec {

  private def freshCatalog(): (String, String) = {
    val root = Files.createTempDirectory("graft_pmgmt").toString
    val cat = s"gpmgmt_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def countJobs[T](body: => T): (T, Int) = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      // the listener bus is async — give queued events a beat to drain
      Thread.sleep(300)
      (r, jobs.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("SHOW PARTITIONS lists identity values typed, supports the " +
    "PARTITION filter, and runs ZERO distributed jobs") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.t (k BIGINT, v BIGINT, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.t (k, v, pk) VALUES
      (1, 10, 0), (2, 20, 1), (3, 60, 2), (4, 1, 1)""")
    val (rows, jobs) = countJobs {
      spark.sql(s"SHOW PARTITIONS $cat.db.t").collect()
        .map(_.getString(0)).sorted.toSeq
    }
    assert(rows == Seq("pk=0", "pk=1", "pk=2"))
    assert(jobs == 0, s"SHOW PARTITIONS must be manifest-only, ran $jobs jobs")
    assert(spark.sql(s"SHOW PARTITIONS $cat.db.t PARTITION (pk=1)")
      .collect().map(_.getString(0)).toSeq == Seq("pk=1"))
  }

  test("SHOW PARTITIONS over hidden layouts lists the RENDERED " +
    "synthetic values (days+bucket composed)") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.h (k BIGINT, ts TIMESTAMP, v BIGINT)
      PARTITIONED BY (days(ts)) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.h (k, ts, v) VALUES
      (1, TIMESTAMP '2024-01-01 10:00:00+00:00', 1),
      (2, TIMESTAMP '2024-01-02 10:00:00+00:00', 2),
      (3, TIMESTAMP '2024-01-02 23:00:00+00:00', 3)""")
    val parts = spark.sql(s"SHOW PARTITIONS $cat.db.h").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(parts.size == 2 && parts.forall(_.startsWith("__gp=2024-01-0")),
      s"expected the two UTC-derived day partitions, got $parts")
  }

  test("DROP PARTITION / TRUNCATE PARTITION empty exactly the named " +
    "partition in one commit; time travel sees the pre-drop state; a " +
    "missing partition is a no-op for DROP IF EXISTS") {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.d (k BIGINT, v BIGINT, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.d (k, v, pk) VALUES
      (1, 10, 0), (2, 20, 1), (3, 60, 2), (4, 1, 1)""")
    val gt = graft.operators.GraftTableMeta.open(spark, s"$root/db/d").get
    val v0 = gt.currentVersion
    spark.sql(s"ALTER TABLE $cat.db.d DROP PARTITION (pk=1)")
    assert(spark.sql(s"SELECT k FROM $cat.db.d ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(gt.currentVersion == v0 + 1, "one commit per drop")
    spark.sql(s"TRUNCATE TABLE $cat.db.d PARTITION (pk=2)")
    assert(spark.sql(s"SELECT k FROM $cat.db.d").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    // pre-drop state intact via time travel
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.d VERSION AS OF $v0")
      .collect()(0).getLong(0) == 4L)
    // absent partition: IF EXISTS no-ops, plain DROP errors
    spark.sql(s"ALTER TABLE $cat.db.d DROP IF EXISTS PARTITION (pk=9)")
    intercept[Throwable] {
      spark.sql(s"ALTER TABLE $cat.db.d DROP PARTITION (pk=9)")
    }
    // ADD PARTITION stays rejected — partitions materialize with data
    intercept[Throwable] {
      spark.sql(s"ALTER TABLE $cat.db.d ADD PARTITION (pk=7)")
    }
  }

  test("t__detail: one metadata-only row with layout, version and live " +
    "file/partition counts; zero jobs") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.m (k BIGINT, v BIGINT, pk BIGINT)
      PARTITIONED BY (pk)
      TBLPROPERTIES ('keys'='k', 'statsCols'='v', 'bloomCols'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.m (k, v, pk) VALUES
      (1, 10, 0), (2, 20, 1)""")
    val (row, jobs) = countJobs {
      spark.sql(s"""SELECT name, format, keys, partitioning, version,
          num_files, num_partitions, num_checks, stats_columns,
          bloom_columns
        FROM $cat.db.m__detail""").collect()(0)
    }
    // the row itself is driver-local (LocalScan over manifest facts);
    // the SELECT's Project may run one trivial local task over it
    assert(jobs <= 1, s"__detail must be metadata-scale, ran $jobs jobs")
    assert(row.getString(0) == "m" && row.getString(1) == "parquet")
    assert(row.getString(2) == "k" && row.getString(3) == "pk")
    assert(row.getLong(4) == 2L) // create + insert
    assert(row.getLong(5) >= 1L && row.getLong(6) == 2L)
    assert(row.getInt(7) == 0)
    assert(row.getString(8) == "v" && row.getString(9) == "k")
  }
}
