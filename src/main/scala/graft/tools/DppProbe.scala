package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.GraftSqlRead

import graft.GraftSession

/** Dev probe: does DYNAMIC PARTITION PRUNING (DSv2 runtime filtering)
  * reach a graft catalog scan? Builds a partitioned fact table + a
  * tiny filtered dimension, runs the star join, and prints the plan's
  * dynamicpruning marker plus the scan's runtime gauges — once for a
  * join on the PARTITION column (directory pruning) and once on a
  * ZONE-MAPPED column (candidate-file pruning).
  */
object DppProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    spark.conf.set("spark.sql.catalog.dpp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dpp.root", base)
    spark.sql("""CREATE TABLE dpp.db.fact (k BIGINT, v BIGINT, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k', 'statsCols'='v')""")
    // 8 partitions x distinct v ranges per insert commit
    (0 until 4).foreach { i =>
      spark.range(i * 1000, i * 1000 + 1000)
        .selectExpr("id AS k", s"id AS v", "id % 8 AS pk")
        .createOrReplaceTempView("src")
      spark.sql("INSERT INTO dpp.db.fact (k, v, pk) SELECT k, v, pk FROM src")
    }
    // dims must be FILE-backed: a LocalRelation folds its filter away
    // before the dynamic-pruning rule can see it
    Seq((0L, 1), (1L, 0), (2L, 0), (3L, 0), (4L, 0), (5L, 0), (6L, 0),
      (7L, 0)).toDF("dk", "flag").write.mode("overwrite")
      .parquet(s"$base/_dim")
    spark.read.parquet(s"$base/_dim").createOrReplaceTempView("dim")
    Seq((50L, 1), (1500L, 1), (99999L, 0)).toDF("dv", "flag")
      .write.mode("overwrite").parquet(s"$base/_dimv")
    spark.read.parquet(s"$base/_dimv").createOrReplaceTempView("dimv")

    def run(tag: String, sql: String): Unit = {
      GraftSqlRead.runtimeFilterEvents.set(0)
      GraftSqlRead.lastPlannedFiles.set(-1)
      GraftSqlRead.lastTotalFiles.set(-1)
      val df = spark.sql(sql)
      val n = df.collect().length
      val plan = df.queryExecution.executedPlan.toString
      println(s"== $tag rows=$n dpp=${plan.contains("dynamicpruning")} " +
        s"events=${GraftSqlRead.runtimeFilterEvents.get} " +
        s"planned=${GraftSqlRead.lastPlannedFiles.get}/" +
        s"${GraftSqlRead.lastTotalFiles.get}")
      if (args.contains("--explain")) println(plan)
    }

    run("partition-join", """SELECT f.k, f.v FROM dpp.db.fact f
      JOIN dim d ON f.pk = d.dk WHERE d.flag = 1""")
    run("statscol-join", """SELECT f.k, f.v FROM dpp.db.fact f
      JOIN dimv d ON f.v = d.dv WHERE d.flag = 1""")

    graft.operators.Fs.deleteTree(base)
    spark.stop()
  }
}
