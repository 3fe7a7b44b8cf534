package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Dev probe: where do hidden-partitioned writes land? */
object HpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_hpp").toString
    spark.conf.set("spark.sql.catalog.hp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.hp.root", base)
    spark.sql("""CREATE TABLE hp.db.d (k BIGINT, v BIGINT, ts TIMESTAMP)
      PARTITIONED BY (days(ts)) TBLPROPERTIES ('keys'='k')""")
    println("meta: " + java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$base/db/d/_graft_meta.json")))
    spark.sql("""INSERT INTO hp.db.d (k, v, ts) VALUES
      (1, 10, TIMESTAMP '2024-03-01 10:00:00'),
      (3, 30, TIMESTAMP '2024-03-02 00:00:01')""")
    java.nio.file.Files.walk(java.nio.file.Paths.get(base)).forEach { p =>
      println(java.nio.file.Paths.get(base).relativize(p))
    }
    println(spark.sql("SELECT k, v FROM hp.db.d").collect().mkString(","))
    // q258 repro: modulo DELETE on a hidden-partitioned table
    spark.sql("""CREATE TABLE hp.db.h2 (k BIGINT, a BIGINT, u BIGINT,
        ts TIMESTAMP)
      PARTITIONED BY (days(ts), bucket(4, u)) TBLPROPERTIES ('keys'='k')""")
    spark.range(0, 100).selectExpr("id AS k", "id AS a", "id % 7 AS u",
      "timestamp_seconds(1700000000 + id * 86400) AS ts")
      .createOrReplaceTempView("h2src")
    spark.sql("INSERT INTO hp.db.h2 (k, a, u, ts) SELECT k, a, u, ts FROM h2src")
    println("pre-delete count: " + spark.sql(
      "SELECT count(*) FROM hp.db.h2").collect()(0).getLong(0))
    try {
      spark.sql("DELETE FROM hp.db.h2 WHERE a % 13 = 0")
      println("delete ok")
    } catch { case e: Throwable => println("delete threw: " + e) }
    println("post-delete count: " + spark.sql(
      "SELECT count(*) FROM hp.db.h2").collect()(0).getLong(0) +
      " (expect 92)")
    try {
      spark.sql("UPDATE hp.db.h2 SET a = a * 3 WHERE a % 11 = 0")
      println("update ok")
    } catch { case e: Throwable => println("update threw: " + e) }
    println("post-update sum: " + spark.sql(
      "SELECT sum(a) FROM hp.db.h2").collect()(0).getLong(0))
    val t2 = graft.operators.GraftTableMeta.open(spark, s"$base/db/h2").get
    println("version before scala delete: " + t2.currentVersion)
    import org.apache.spark.sql.functions.col
    t2.deleteWhere(col("a") % 13 === 0)
    println("version after scala delete: " + t2.currentVersion)
    println("scala read count: " + t2.read.count() + " (expect < 100)")
    println("sql count: " + spark.sql(
      "SELECT count(*) FROM hp.db.h2").collect()(0).getLong(0))
    println("hasDv: " + t2.hasDeletionVectorsAt(t2.currentVersion))
    println("dvPointers: " + t2.dvPointersAt(t2.currentVersion).size)
    println("manifest sample: " +
      t2.liveFilesAt(t2.currentVersion).take(2).mkString(" | "))
    println("dvPointer keys: " + t2.dvPointersAt(t2.currentVersion)
      .keys.take(2).mkString(" | "))
    graft.operators.Fs.deleteTree(base)
    spark.stop()
  }
}
