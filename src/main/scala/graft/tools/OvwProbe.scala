package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Dev probe: which physical write does each INSERT OVERWRITE shape
  * plan against a graft catalog table?
  */
object OvwProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_ovwp").toString
    spark.conf.set("spark.sql.catalog.op", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.op.root", base)
    spark.sql("""CREATE TABLE op.db.t (k BIGINT, v BIGINT, day STRING)
      PARTITIONED BY (day) TBLPROPERTIES ('keys'='k')""")
    spark.sql("INSERT INTO op.db.t (k, v, day) VALUES (1, 10, 'd1'), (3, 30, 'd2')")

    def show(tag: String, sql: String): Unit = {
      val qe = spark.sql(sql).queryExecution
      println(s"== $tag: ${qe.executedPlan.getClass.getSimpleName} / " +
        qe.analyzed.getClass.getSimpleName)
      println(spark.sql("SELECT k, v, day FROM op.db.t").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
        .sorted.mkString(" "))
    }
    show("collist-values", "INSERT OVERWRITE op.db.t (k, v, day) VALUES (9, 90, 'd9')")
    show("plain-select", "INSERT OVERWRITE op.db.t SELECT 8, 80, 'd8'")
    graft.operators.Fs.deleteTree(base)
    spark.stop()
  }
}
