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
    for (bits <- Seq(4, 6, 8)) {
      report(s"jl-bucketed(bits=$bits)",
        SimilaritySearch.jlBucketedTopK(q, e, "vec_id", "embedding", k, bits, dIn = 64))
    }
    // bucket-occupancy balance: axis-sign vs JL buckets. Report the
    // max/mean occupancy ratio — the skew factor a co-located probe
    // join actually pays (1.0 = perfectly balanced).
    for (bits <- Seq(8)) {
      import graft.functions.VectorFns
      def skew(bucket: org.apache.spark.sql.Column): (Long, Double) = {
        val occ = e.select(bucket.as("b")).groupBy("b").agg(count(lit(1)).as("c"))
          .agg(count(lit(1)).as("nb"), max(col("c")).as("mx"), avg(col("c")).as("mean"))
          .collect()(0)
        (occ.getLong(0), occ.getLong(1) / occ.getDouble(2))
      }
      val (nbAxis, skAxis) = skew(VectorFns.signBucket(col("embedding"), bits))
      val (nbJl, skJl) = skew((0 until bits).map(j =>
        when(VectorFns.jlCoord(col("embedding"), 64, j) > 0, 1 << j).otherwise(0))
        .reduce(_ + _))
      println(f"OCCUPANCY axis(bits=$bits) buckets=$nbAxis max/mean=$skAxis%.2f")
      println(f"OCCUPANCY jl(bits=$bits)   buckets=$nbJl max/mean=$skJl%.2f")
    }
    for (nProbe <- Seq(2, 4, 8)) {
      report(s"ivf(C=16,nProbe=$nProbe)",
        SimilaritySearch.ivfTopK(q, e, e.filter(col("vec_id") < 16),
          "vec_id", "embedding", "vec_id", k, nProbe))
    }
    // graph-based ANN: recall vs (degree, beam, hops) — the knob
    // triple HNSW-family deployments tune; the graph is rebuilt per
    // degree (index-side cost), beam/hops are query-side only
    for (degree <- Seq(8, 16)) {
      val g = SimilaritySearch.knnGraph(e, "vec_id", "embedding", degree)
        .localCheckpoint(true)
      for ((beam, hops) <- Seq((8, 3), (16, 4))) {
        report(s"graph(deg=$degree,beam=$beam,hops=$hops)",
          SimilaritySearch.graphAnnTopK(q, e, "vec_id", "embedding", g,
            k, beam, hops))
        // IVF-seeded entries vs the min-id entry on the SAME graph: the
        // small-beam recall floor is entry-point distance
        report(s"graph-seeded(deg=$degree,beam=$beam,hops=$hops,C=16,nProbe=2)",
          SimilaritySearch.graphAnnTopKSeeded(q, e,
            e.filter(col("vec_id") < 16), "vec_id", "embedding", "vec_id",
            g, 2, k, beam, hops))
        // hierarchical 2-layer walk on the SAME layer-0 graph (layer 1
        // = every 4th vector, exact deg-8 upper graph)
        val l1 = e.filter(col("vec_id") % 4 === 0)
        val g1 = SimilaritySearch.knnGraph(l1, "vec_id", "embedding", 8)
          .localCheckpoint(true)
        report(s"graph-hier(deg=$degree,beam=$beam,hops=$hops,l1=1/4,deg1=8)",
          SimilaritySearch.graphAnnTopKHier(q, e, "vec_id", "embedding",
            g, g1, l1.select("vec_id"), k, beam1 = beam, hops1 = 2,
            beam = beam, hops = hops))
      }
    }
    // NN-descent build quality: search recall through the DESCENT graph
    // (no N² build) vs through the exact graph, per refinement round
    for (rounds <- Seq(1, 2, 3)) {
      val gd = SimilaritySearch.knnGraphDescent(e, "vec_id", "embedding",
        16, rounds).select(col("src"), col("nbr")).localCheckpoint(true)
      report(s"graph-descent(deg=16,rounds=$rounds,beam=16,hops=4)",
        SimilaritySearch.graphAnnTopK(q, e, "vec_id", "embedding", gd,
          k, 16, 4))
    }
    // PQ measures QUANTIZATION loss, so its baseline is the exact
    // squared-L2 answer (PQ approximates L2; the cosine baseline would
    // mix in metric mismatch on unnormalized vectors).
    import graft.functions.VectorFns
    import org.apache.spark.sql.expressions.Window
    val qn = q.select(col("vec_id").as("qid"), col("embedding").as("qv"),
      VectorFns.norm2Fixed9(col("embedding")).as("qn2"))
    val cn = e.select(col("vec_id").as("nid"), col("embedding").as("nv"),
      VectorFns.norm2Fixed9(col("embedding")).as("nn2"))
    val wL2 = Window.partitionBy("qid").orderBy(col("d"), col("nid"))
    val exactL2 = qn.join(cn, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (col("qn2") + col("nn2")
          - lit(2L) * VectorFns.dotFixed9(col("qv"), col("nv"))).as("d"))
      .withColumn("rank", row_number().over(wL2)).filter(col("rank") <= k)
      .localCheckpoint(true)
    def reportL2(name: String, approx: org.apache.spark.sql.DataFrame): Unit = {
      val r = SimilaritySearch.recallAtK(approx, exactL2).collect()(0)
      println(f"RECALL $name n_queries=${r.getLong(0)} recall@$k=${r.getDouble(1)}%.4f")
    }
    for (ksub <- Seq(16, 32, 64)) {
      val cb = SimilaritySearch.pqSeedCodebook(e, "vec_id", "embedding",
        m = 8, subDim = 8, ksub = ksub)
      val codes = SimilaritySearch.pqEncode(e, "vec_id", "embedding", cb,
        m = 8, subDim = 8)
      reportL2(s"pq(m=8,ksub=$ksub,seed)-vs-L2",
        SimilaritySearch.pqTopK(q, codes, cb, "vec_id", "embedding", k, m = 8, subDim = 8))
    }
    // the two production levers: trained codebooks, and ADC-shortlist +
    // exact re-rank (full-precision math on Q·shortlist rows only)
    for (iters <- Seq(2)) {
      val cbT = SimilaritySearch.pqTrainCodebook(e, "vec_id", "embedding",
        m = 8, subDim = 8, ksub = 64, iters = iters)
      val codesT = SimilaritySearch.pqEncode(e, "vec_id", "embedding", cbT,
        m = 8, subDim = 8)
      reportL2(s"pq(m=8,ksub=64,lloyd=$iters)-vs-L2",
        SimilaritySearch.pqTopK(q, codesT, cbT, "vec_id", "embedding", k, m = 8, subDim = 8))
      for (shortlist <- Seq(25, 50)) {
        reportL2(s"pq-rerank(ksub=64,lloyd=$iters,T=$shortlist)-vs-L2",
          SimilaritySearch.pqTopKRerank(q, codesT, e, cbT, "vec_id", "embedding",
            k, shortlist, m = 8, subDim = 8))
      }
    }
    spark.stop()
  }
}
