package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Dev probe: SHOW CREATE TABLE / DESCRIBE EXTENDED rendering, and
  * MERGE with source columns the target lacks (schema-evolution
  * intent).
  */
object SqlSurfaceProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_ssp").toString
    spark.conf.set("spark.sql.catalog.sp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sp.root", base)
    spark.sql("""CREATE TABLE sp.db.t (k BIGINT, v BIGINT, ts TIMESTAMP)
      PARTITIONED BY (days(ts)) TBLPROPERTIES ('keys'='k', 'statsCols'='v')""")
    spark.sql("""INSERT INTO sp.db.t (k, v, ts) VALUES
      (1, 10, TIMESTAMP '2024-01-01 00:00:00')""")
    def attempt(tag: String)(body: => Unit): Unit =
      try { body; println(s"== $tag OK") }
      catch { case e: Throwable =>
        println(s"== $tag FAILED ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).take(250)) }
    attempt("show-create") {
      println(spark.sql("SHOW CREATE TABLE sp.db.t").collect()(0).getString(0))
    }
    attempt("merge-evolve") {
      spark.range(1).selectExpr("CAST(2 AS BIGINT) AS k",
        "CAST(20 AS BIGINT) AS v",
        "TIMESTAMP '2024-01-02 00:00:00' AS ts", "'x' AS extra")
        .createOrReplaceTempView("msrc")
      spark.sql("""MERGE INTO sp.db.t t USING msrc s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (k, v, ts) VALUES (s.k, s.v, s.ts)""")
      println(spark.sql("SELECT k, v FROM sp.db.t").collect().mkString(","))
    }
    attempt("merge-star-evolve") {
      spark.sql("""MERGE INTO sp.db.t t USING msrc s ON t.k = s.k
        WHEN NOT MATCHED THEN INSERT *""")
      println(spark.sql("SELECT * FROM sp.db.t").collect().mkString(","))
    }
    graft.operators.Fs.deleteTree(base)
    spark.stop()
  }
}
