package graft.tools
import org.apache.spark.sql.SparkSession
import graft.GraftSession
object ProbeView {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("graft_pv").toString
    spark.conf.set("spark.sql.catalog.pv", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pv.root", base)
    spark.sql("""CREATE TABLE pv.db.t (k BIGINT, v BIGINT, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k')""")
    spark.sql("INSERT INTO pv.db.t (k, v, pk) VALUES (1,10,0),(2,20,1),(3,60,0)")
    def probe(tag: String)(body: => Any): Unit =
      try println(s"== $tag OK: ${body}")
      catch { case e: Throwable => println(s"== $tag FAIL ${e.getClass.getSimpleName}: " +
        e.getMessage.linesIterator.take(2).mkString(" | ")) }
    probe("call-create-view") {
      spark.sql("""CALL pv.system.create_view('db.vw',
        'SELECT k, v FROM pv.db.t WHERE v > 15')""").collect().mkString(",")
    }
    probe("select-through-view") {
      spark.sql("SELECT * FROM pv.db.vw ORDER BY k").collect().mkString(",")
    }
    probe("pushdown-through-view") {
      val p = spark.sql("SELECT k FROM pv.db.vw WHERE k = 2")
        .queryExecution.executedPlan.toString
      p.linesIterator.filter(l => l.contains("PushedFilters") || l.contains("Scan")).mkString(" || ").take(400)
    }
    probe("view-over-view") {
      spark.sql("""CALL pv.system.create_view('db.vw2',
        'SELECT k FROM pv.db.vw WHERE k >= 2')""")
      spark.sql("SELECT * FROM pv.db.vw2 ORDER BY k").collect().mkString(",")
    }
    probe("call-show-views") {
      spark.sql("CALL pv.system.show_views('db')").collect().mkString(",")
    }
    probe("call-drop-view") {
      spark.sql("CALL pv.system.drop_view('db.vw2')").collect().mkString(",")
    }
    probe("select-dropped-view") {
      spark.sql("SELECT * FROM pv.db.vw2").collect().length
    }
    spark.stop()
  }
}
