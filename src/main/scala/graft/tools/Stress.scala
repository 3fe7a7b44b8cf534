package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Scaling-curve harness: multiply the documents corpus M× (ids offset,
  * text perturbed per copy so clones are NEAR-dups, not exact) and
  * measure each dedup operator at each multiple.
  *
  * Reports SHUFFLE-READ and INPUT record counts (deterministic task
  * metrics) alongside wall time: this host has multi-minute external
  * stall windows that make wall-clock curves uninterpretable, but record
  * counts are exact. The thing to check is the SHAPE: shuffle records
  * must grow ~linearly in corpus size (plus the true output-pair count,
  * which is quadratic in M by construction here — every near-dup pair
  * exists in M×M copy combinations). A blocking key failing at scale
  * shows up as super-linear shuffle growth BEYOND the output term.
  *
  * Usage: Stress [sfDir] [multiples…]
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 2, 4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleRec = new AtomicLong(0)
    val inputRec = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shuffleRec.addAndGet(m.shuffleReadMetrics.recordsRead)
          inputRec.addAndGet(m.inputMetrics.recordsRead)
        }
      }
    })

    def corpus(mult: Int): DataFrame = {
      val d0 = Tables.documents(spark, sfDir)
      (0 until mult).map { i =>
        d0.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          concat(col("text"), lit(s" copymark$i")).as("text"))
      }.reduce(_ unionByName _)
    }
    def measure(tag: String)(f: => Long): Unit = {
      Thread.sleep(1500) // let listener events drain from the previous op
      shuffleRec.set(0); inputRec.set(0)
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9 // capture BEFORE the drain sleep
      Thread.sleep(1500)
      println(f"STRESS $tag wall=$dt%.1fs " +
        f"out=$n shuffleRec=${shuffleRec.get()} inputRec=${inputRec.get()}")
    }

    mults.foreach { m =>
      val docs = corpus(m)
      println(s"== mult=$m docs=${docs.count()}")
      measure(s"m$m exact")(Dedup.fingerprintClusters(docs, "doc_id", "text").count())
      measure(s"m$m jaccard")(Dedup.jaccardPairs(docs, "doc_id", "text", 4, 100 * m, 1, 10).count())
      measure(s"m$m minhash")(Dedup.minhashLshPairs(docs, "doc_id", "text", 4, 12, 3).count())
      measure(s"m$m simhash")(Dedup.simhashPairs(docs, "doc_id", "text", 1).count())
      measure(s"m$m winnow")(Dedup.winnowFingerprints(docs, "doc_id", "text", 8, 4).count())
    }
    spark.stop()
  }
}
