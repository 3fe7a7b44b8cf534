package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftSession

/** Probe: which INSERT shapes the analyzer's column-DEFAULT fill
  * serves over the graft catalog (SUPPORT_COLUMN_DEFAULT_VALUE).
  */
object DefaultProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("graft_defp").toString
    spark.conf.set("spark.sql.catalog.dp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dp.root", base)
    spark.sql("""CREATE TABLE dp.db.t (day STRING, pk STRING,
        n BIGINT DEFAULT 42, tag STRING DEFAULT 'none')
      PARTITIONED BY (day) TBLPROPERTIES ('keys'='pk')""")
    println("schema: " + spark.table("dp.db.t").schema.map(f =>
      s"${f.name}:${f.dataType.simpleString}:${f.metadata}").mkString(" | "))
    def run(sql: String): Unit =
      try { spark.sql(sql); println(s"OK   $sql") }
      catch { case e: Throwable =>
        println(s"FAIL $sql -> ${e.getMessage.take(150)}") }
    run("INSERT INTO dp.db.t (day, pk) VALUES ('d1', 'a')")
    run("INSERT INTO dp.db.t (day, pk, n) VALUES ('d1', 'b', 7)")
    run("INSERT INTO dp.db.t VALUES ('d2', 'c', DEFAULT, 'x')")
    spark.sql("SELECT * FROM dp.db.t").show()
    graft.operators.Fs.deleteTree(java.nio.file.Paths.get(base))
    spark.stop()
  }
}
