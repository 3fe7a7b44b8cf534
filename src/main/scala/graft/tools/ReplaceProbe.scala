package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Dev probe: what do CREATE OR REPLACE TABLE / REPLACE TABLE AS
  * SELECT plan against the graft catalog today?
  */
object ReplaceProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_rp").toString
    spark.conf.set("spark.sql.catalog.rp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rp.root", base)
    spark.sql("""CREATE TABLE rp.db.t (k BIGINT, v BIGINT, day STRING)
      PARTITIONED BY (day) TBLPROPERTIES ('keys'='k')""")
    spark.sql("INSERT INTO rp.db.t (k, v, day) VALUES (1, 10, 'd1')")
    def attempt(tag: String)(body: => Unit): Unit =
      try { body; println(s"== $tag OK") }
      catch { case e: Throwable =>
        println(s"== $tag FAILED ${e.getClass.getSimpleName}: " +
          e.getMessage.take(200)) }
    attempt("create-or-replace") {
      spark.sql("""CREATE OR REPLACE TABLE rp.db.t (k BIGINT, s STRING)
        TBLPROPERTIES ('keys'='k')""")
      println(spark.sql("SELECT * FROM rp.db.t").schema.simpleString)
    }
    attempt("rtas") {
      spark.sql("""REPLACE TABLE rp.db.t TBLPROPERTIES ('keys'='k')
        AS SELECT CAST(7 AS BIGINT) AS k, 'x' AS s""")
      println(spark.sql("SELECT k, s FROM rp.db.t").collect().mkString(","))
    }
    graft.operators.Fs.deleteTree(base)
    spark.stop()
  }
}
