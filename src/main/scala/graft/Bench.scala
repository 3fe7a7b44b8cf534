package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    // Two passes, per-query MIN: the host shows sporadic multi-minute
    // stall windows (external; documented in NOTES_r2) that can inflate
    // a single measurement 10-50x. Min-of-two is the standard
    // steady-state number and halves the odds any query's figure is a
    // stall artifact. Cache is cleared between queries so no query's
    // pinned working set distorts the next.
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val best = scala.collection.mutable.Map.empty[String, Double]
    val succeeded = scala.collection.mutable.Set.empty[String]
    for (_ <- 1 to 2; (name, fn) <- names) {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
        succeeded += name
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    // a query that never succeeded must not be recorded as a fast time
    val failed = names.map(_._1).filterNot(succeeded)
    val qs = names.map { case (k, _) =>
      "\"" + k + "\":" + (if (succeeded(k)) best(k) else -1.0)
    }.mkString("{", ",", "}")
    val total = succeeded.toSeq.map(best).sum
    val failJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failJson,"passes":2,"note":"per-query min of 2 passes","sf":"$sfDir"}"""
    println(line)
    // ALSO write the JSON to its own file: the driver's log-tail parse
    // has arrived clipped before (BENCH_r05 recorded "parsed": null) —
    // a dedicated artifact can never be truncated by surrounding output
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    spark.stop()
    // The driver's tail-parse reads only the last ~2,000 characters of
    // stdout, and the full per-query map (~8 KB for 229 queries) can
    // never survive that window whole — BENCH_r05/r07 arrived
    // "parsed": null. So the LAST line is a COMPACT summary (total, n,
    // failed — no per-query map); the full per-query line lives in
    // bench_out.json above. Printed after spark.stop() so no shutdown
    // logging can land after it.
    val compact = s"""{"metric":"total","value":$total,"unit":"sec","n":${succeeded.size},"failed":$failJson,"passes":2,"note":"per-query min of 2 passes; per-query map in bench_out.json","sf":"$sfDir"}"""
    println(compact)
    System.out.flush()
  }
}
