package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Dev probe: what does the analyzer hand a DSv2 write for GENERATED
  * ALWAYS AS (expr) and GENERATED ALWAYS AS IDENTITY columns once the
  * catalog declares the capabilities?
  */
object GenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_gen").toString
    spark.conf.set("spark.sql.catalog.gp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gp.root", base)
    def attempt(tag: String)(body: => Unit): Unit =
      try { body; println(s"== $tag OK") }
      catch { case e: Throwable =>
        println(s"== $tag FAILED ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).take(300)) }

    attempt("create-generated") {
      spark.sql("""CREATE TABLE gp.db.g (k BIGINT, v BIGINT,
        twice BIGINT GENERATED ALWAYS AS (v * 2))
        TBLPROPERTIES ('keys'='k')""")
      println("schema json: " + graft.operators.GraftTableMeta
        .open(spark, s"$base/db/g").get.read.schema.json.take(600))
    }
    attempt("insert-generated-omitted") {
      spark.sql("INSERT INTO gp.db.g (k, v) VALUES (1, 10)")
      println(spark.sql("SELECT * FROM gp.db.g").collect().mkString(","))
    }
    attempt("insert-generated-explicit") {
      spark.sql("INSERT INTO gp.db.g (k, v, twice) VALUES (2, 20, 99)")
      println(spark.sql("SELECT * FROM gp.db.g").collect().mkString(","))
    }
    attempt("create-identity") {
      spark.sql("""CREATE TABLE gp.db.i (
        id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2),
        v BIGINT) TBLPROPERTIES ('keys'='id')""")
      val t = graft.operators.GraftTableMeta.open(spark, s"$base/db/i").get
      println("schema json: " + t.read.schema.json.take(600))
    }
    attempt("insert-identity-omitted") {
      spark.sql("INSERT INTO gp.db.i (v) VALUES (100), (200)")
      println(spark.sql("SELECT * FROM gp.db.i").collect().mkString(","))
    }
    attempt("insert-identity-explicit") {
      spark.sql("INSERT INTO gp.db.i (id, v) VALUES (999, 300)")
      println(spark.sql("SELECT * FROM gp.db.i").collect().mkString(","))
    }
    graft.operators.Fs.deleteTree(base)
    spark.stop()
  }
}
