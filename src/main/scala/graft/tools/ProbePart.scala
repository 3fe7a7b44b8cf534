package graft.tools
import org.apache.spark.sql.SparkSession
import graft.GraftSession
object ProbePart {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("graft_pp").toString
    spark.conf.set("spark.sql.catalog.pp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pp.root", base)
    spark.sql("""CREATE TABLE pp.db.t (k BIGINT, v BIGINT, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k')""")
    spark.sql("INSERT INTO pp.db.t (k, v, pk) VALUES (1,10,0),(2,20,1),(3,60,2),(4,1,1)")
    spark.sql("""CREATE TABLE pp.db.h (k BIGINT, ts TIMESTAMP, v BIGINT)
      PARTITIONED BY (days(ts), bucket(4, k)) TBLPROPERTIES ('keys'='k')""")
    spark.sql("""INSERT INTO pp.db.h (k, ts, v) VALUES
      (1, TIMESTAMP '2024-01-01 10:00:00+00:00', 1),
      (2, TIMESTAMP '2024-01-02 10:00:00+00:00', 2)""")
    def probe(tag: String)(body: => Any): Unit =
      try println(s"== $tag OK: ${body}")
      catch { case e: Throwable => println(s"== $tag FAIL ${e.getClass.getSimpleName}: " +
        e.getMessage.linesIterator.take(2).mkString(" | ")) }
    probe("show-partitions") {
      spark.sql("SHOW PARTITIONS pp.db.t").collect().map(_.getString(0)).sorted.mkString(",")
    }
    probe("show-partitions-filtered") {
      spark.sql("SHOW PARTITIONS pp.db.t PARTITION (pk=1)").collect().mkString(",")
    }
    probe("show-partitions-hidden") {
      spark.sql("SHOW PARTITIONS pp.db.h").collect().map(_.getString(0)).sorted.mkString(",")
    }
    probe("drop-partition") {
      spark.sql("ALTER TABLE pp.db.t DROP PARTITION (pk=1)")
      spark.sql("SELECT k FROM pp.db.t ORDER BY k").collect().map(_.getLong(0)).mkString(",")
    }
    probe("truncate-partition") {
      spark.sql("TRUNCATE TABLE pp.db.t PARTITION (pk=2)")
      spark.sql("SELECT k FROM pp.db.t ORDER BY k").collect().map(_.getLong(0)).mkString(",")
    }
    probe("time-travel-after-drop") {
      spark.sql("SELECT count(*) FROM pp.db.t VERSION AS OF 2").collect()(0).getLong(0)
    }
    probe("detail") {
      spark.sql("SELECT name, keys, partitioning, version, num_files, num_partitions FROM pp.db.t__detail").collect().mkString(",")
    }
    spark.stop()
  }
}
