package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Dev check: does runtime exchange reuse fire for the self-joining
  * dedup operators (SimHash band join, Jaccard df-cap semi-join)? The
  * static `explain` cannot show AQE stage reuse — inspect the executed
  * plan after the action instead.
  */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir)
    Seq(
      "simhash" -> graft.operators.Dedup.simhashPairs(docs, "doc_id", "text", 1),
      "jaccard" -> graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", 4, 100, 1, 10),
      "minhash" -> graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text", 4, 12, 3)
    ).foreach { case (tag, df) =>
      df.collect()  // collect drives THIS dataset's QueryExecution (count() builds its own)
      val p = df.queryExecution.executedPlan.toString
      val stageIds = "ShuffleQueryStage (\\d+)".r.findAllMatchIn(p).map(_.group(1)).toSeq
      println(s"CHECK $tag stages=${stageIds.size} distinct=${stageIds.distinct.size} " +
        s"reused=${p.contains("ReusedExchange")}")
    }
    spark.stop()
  }
}

/** Same check for the round-3 multi-consumer operators (decontamination's
  * shared shingle subtree, the prefix-Jaccard posting fan-out).
  */
object ReuseCheck2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir)
    Seq(
      "decontam" -> graft.operators.Contamination.ngramOverlap(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 20 =!= 0),
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 20 === 0),
        "doc_id", "text", 4),
      "prefixjac" -> graft.operators.Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 4, 1, 2)
    ).foreach { case (tag, df) =>
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val scans = "FileScan parquet".r.findAllIn(p).size
      println(s"CHECK $tag reused=${p.contains("ReusedExchange")} parquetScans=$scans")
    }
    spark.stop()
  }
}
