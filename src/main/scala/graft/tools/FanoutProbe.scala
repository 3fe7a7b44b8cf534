package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, Queries}

/** Dev probe: run queries with an explicit `graft.fanout.partitions`
  * override (the conf is runtime-set, not reachable from run.sh).
  * Usage: FanoutProbe <sfDir> <fanout> <q1,q2,...>
  */
object FanoutProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, fan, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    GraftSession.tune(spark)
    spark.conf.set("graft.fanout.partitions", fan)
    spark.sparkContext.setLogLevel("ERROR")
    val reg = Queries.all.map(q => q.name -> q.run).toMap
    names.split(",").foreach { n =>
      val t0 = System.nanoTime()
      val cnt = reg(n)(spark, sfDir).count()
      println(f"TIME $n ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$cnt fanout=$fan")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
