package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.SimilaritySearch

/** Dev/round tool: recall@k of every ANN variant against the exact
  * brute-force answer on the embeddings table — the quality dimension
  * the hash-based correctness gate cannot observe. Uses one shared
  * query set (vec_id < 32) and k=5 so the variants are directly
  * comparable. Usage: Recall <sfDir>
  */
object Recall {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 32)
    val k = 5
    val exact = SimilaritySearch.bruteForceTopK(q, e, "vec_id", "embedding", k)
      .localCheckpoint(true) // scored once, compared against 3 variants
    def report(name: String, approx: org.apache.spark.sql.DataFrame): Unit = {
      val r = SimilaritySearch.recallAtK(approx, exact).collect()(0)
      println(f"RECALL $name n_queries=${r.getLong(0)} recall@$k=${r.getDouble(1)}%.4f")
    }
    for (bits <- Seq(4, 6, 8)) {
      report(s"bucketed(bits=$bits)",
        SimilaritySearch.bucketedTopK(q, e, "vec_id", "embedding", k, bits))
      report(s"multiprobe(bits=$bits)",
        SimilaritySearch.bucketedTopKMultiProbe(q, e, "vec_id", "embedding", k, bits))
    }
    for (nProbe <- Seq(2, 4, 8)) {
      report(s"ivf(C=16,nProbe=$nProbe)",
        SimilaritySearch.ivfTopK(q, e, e.filter(col("vec_id") < 16),
          "vec_id", "embedding", "vec_id", k, nProbe))
    }
    spark.stop()
  }
}
