package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.operators.GraftTable

/** Dev/round tool: commit-cost flatness of the GraftTable commit path.
  * 60 single-row upserts into rotating partitions accumulate files and
  * versions; with O(commit) commits (per-commit staging dir + delta
  * manifests) the per-upsert wall must stay FLAT — the r6 design
  * (two full tree walks + full manifest rewrite per mutation) grew with
  * every accumulated file. Per-group minimums are the signal (the host
  * has interference windows). Usage: CommitProbe
  */
object CommitProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_commitprobe").toString
    val t = new GraftTable(spark, s"$base/t", Seq("pk"), "day")
    t.createIfNotExists(org.apache.spark.sql.types.StructType.fromDDL(
      "pk BIGINT, v BIGINT, day STRING"))
    val times = (1 to 60).map { i =>
      val df = Seq((i.toLong, i.toLong, s"d${i % 6}")).toDF("pk", "v", "day")
      val t0 = System.nanoTime()
      t.upsertReplace(df)
      (System.nanoTime() - t0) / 1e9
    }
    times.grouped(10).zipWithIndex.foreach { case (g, gi) =>
      println(f"COMMITS ${gi * 10 + 1}%3d-${gi * 10 + 10}%3d  " +
        f"min=${g.min}%.3f s  mean=${g.sum / g.size}%.3f s")
    }
    println(s"final liveFiles=${t.dataFileCount} versions=${t.versions.size}")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(base))
    spark.stop()
  }
}
