package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, Tables}

/** Dev tool: replay the q270 mview lifecycle statement-by-statement with
  * wall-clock timers, to locate where a lifecycle query's seconds go
  * (statement latency, not dataflow volume, dominates these at sf0.1).
  * Usage: StmtProbe <sfDir>
  */
object StmtProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val jobTime = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts =
          new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); starts.put(j.jobId, j.time)
          if (sys.env.contains("STMT_PROBE_TRACE"))
            println(s"  JOB ${j.jobId} stages=${j.stageInfos.size} " +
              j.stageInfos.map(s => s.name.takeWhile(_ != '(').trim + ":" +
                s.numTasks).mkString(" | "))
          ()
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(j.jobId))
            .foreach(t0 => jobTime.addAndGet(j.time - t0))
          ()
        }
      })
    def t[A](label: String)(f: => A): A = {
      val j0 = jobs.get(); val jt0 = jobTime.get()
      val t0 = System.nanoTime()
      val r = f
      println(f"STMT $label ${(System.nanoTime() - t0) / 1e9}%.2f s  " +
        f"jobs=${jobs.get() - j0} jobtime=${(jobTime.get() - jt0) / 1e3}%.2f s")
      r
    }

    for (round <- 1 to 2) {
      println(s"---- pass $round")
      val base = java.nio.file.Files.createTempDirectory("graft_probe_").toString
      Tables.events(spark, sfDir).createOrReplaceTempView("probe_events")
      val cat = s"gcat_${java.util.UUID.randomUUID().toString.take(8)}".replace("-", "_")
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", base)
      t("create_table")(spark.sql(s"""CREATE TABLE $cat.db.ev (
          event_id BIGINT, user_id BIGINT, cents BIGINT, pk BIGINT)
        PARTITIONED BY (pk)
        TBLPROPERTIES ('keys'='event_id', 'statsCols'='cents')"""))
      t("insert_even")(spark.sql(s"""INSERT INTO $cat.db.ev (event_id, user_id, cents, pk)
        SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT), user_id % 4
        FROM probe_events WHERE event_id % 2 = 0"""))
      t("create_mview")(spark.sql(s"""CALL $cat.system.create_mview('db.spend',
        base => 'db.ev', keys => 'user_id', measures => 'cents')"""))
      t("insert_odd")(spark.sql(s"""INSERT INTO $cat.db.ev (event_id, user_id, cents, pk)
        SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT), user_id % 4
        FROM probe_events WHERE event_id % 2 = 1"""))
      t("refresh_incr")(spark.sql(s"CALL $cat.system.refresh_mview('db.spend')").collect())
      t("update")(spark.sql(s"UPDATE $cat.db.ev SET cents = cents + 7 WHERE cents % 5 = 0"))
      t("refresh_full")(spark.sql(s"CALL $cat.system.refresh_mview('db.spend')").collect())
      t("final_select")(spark.sql(
        s"SELECT user_id, n_rows, sum_cents, avg_cents FROM $cat.db.spend")
        .localCheckpoint(true))
      graft.operators.Fs.deleteTree(base)
    }
    spark.stop()
  }
}
