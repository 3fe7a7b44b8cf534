package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.TextFns
import graft.operators.{Chunking, Classifier, CorpusText, Pii, Staging}
/** Dev tool: per-stage wall times of the q168 capstone. Usage: CapProfile <sfDir> */
object CapProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    GraftSession.tune(spark); spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $tag ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val nav = "home about contact news"
    val docs = Tables.documents(spark, dir)
    val paged = docs
      .withColumn("w", TextFns.tokens(col("text")))
      .withColumn("body", when(size(col("w")) === 0, lit("")).otherwise(array_join(
        transform(sequence(lit(0), expr("((size(w) + 3) div 4) - 1")),
          i => array_join(slice(col("w"), i * lit(4) + 1, lit(4)), " ")), "\n")))
      .withColumn("page", concat(
        lit(nav), lit("\n"), col("body"), lit("\n"), lit(nav), lit("\n"),
        lit("reach us "), col("lang"), col("doc_id").cast("string"),
        lit("@mail.example.com tel +1 (555) 010-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
    val pages = t("pages")(Staging.stage(paged.select(col("doc_id"), col("page")), "cp_pages"))
    val scrubbed = t("scrub")(Staging.stage(Pii.scrub(pages.df, "page"), "cp_scrub"))
    val deduped = t("linededup")(Staging.stage(
      CorpusText.dedupLinesWithinDoc(scrubbed.df.select(col("doc_id"), col("clean")), "doc_id", "clean"), "cp_dedup"))
    val pred = Classifier.predictFused(deduped.df, "doc_id", "clean",
      Classifier.syntheticModel(spark, 4096, 4), 4096)
    val surv = t("classify+join")(Staging.stage(
      deduped.df.join(pred.filter(col("pred_cls") =!= 3).select("doc_id"), Seq("doc_id"))
        .select("doc_id", "clean"), "cp_surv"))
    val chunks = t("cdc")(Staging.stage(
      Chunking.cdcChunksCodegen(surv.df, "doc_id", "clean", 6)
        .withColumn("h", md5(col("chunk"))), "cp_chunks"))
    t("rollup") {
      val uniq = chunks.df.groupBy("h").agg(min(col("len")).as("l")).agg(sum(col("l")).as("unique_bytes"))
      docs.agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(scrubbed.df.agg(sum(col("n_email") + col("n_card") + col("n_ip") + col("n_phone")).as("n_pii"))))
        .crossJoin(broadcast(deduped.df.agg(sum(col("n_lines")).as("lt"), sum(col("n_kept")).as("lk"))))
        .crossJoin(broadcast(surv.df.agg(count(lit(1)).as("dk"))))
        .crossJoin(broadcast(chunks.df.agg(count(lit(1)).as("nc"), countDistinct(col("h")).as("nu"), sum(col("len")).as("tb"))))
        .crossJoin(broadcast(uniq)).collect()
    }
    Seq(pages, scrubbed, deduped, surv, chunks).foreach(_.delete())
    spark.stop()
  }
}
