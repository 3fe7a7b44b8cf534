package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftSession

/** Plan-shape evidence for COLUMN MAPPING (round 11): a renamed
  * column's SQL scan must keep parquet PushedFilters + a pruned
  * ReadSchema (physical names), while the surface stays logical.
  * Prints the formatted plan + the pruning gauges.
  */
object MapPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("graft_mapplan").toString
    spark.conf.set("spark.sql.catalog.mp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mp.root", base)
    spark.sql("""CREATE TABLE mp.db.t (day STRING, pk STRING, v BIGINT,
        w STRING)
      PARTITIONED BY (day) TBLPROPERTIES ('keys'='pk', 'statsCols'='v')""")
    spark.sql("""INSERT INTO mp.db.t (day, pk, v, w)
      SELECT 'd' || CAST(id % 4 AS STRING), 'p' || CAST(id AS STRING),
        id, 'w' || CAST(id AS STRING)
      FROM range(0, 4000)""")
    spark.sql("CALL mp.system.compact_range('db.t', 'v', buckets => 8)")
    spark.sql("ALTER TABLE mp.db.t RENAME COLUMN v TO amount")
    val df = spark.sql(
      "SELECT pk, amount FROM mp.db.t WHERE amount BETWEEN 100 AND 120")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    val n = df.count()
    println(s"rows=$n  plannedFiles=" +
      org.apache.spark.sql.graft.GraftSqlRead.lastPlannedFiles.get() +
      " of " + org.apache.spark.sql.graft.GraftSqlRead.lastTotalFiles.get())
    graft.operators.Fs.deleteTree(java.nio.file.Paths.get(base))
    spark.stop()
  }
}
