package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, Queries}

/** Dev tool: time and/or explain individual queries.
  * Usage: Profile <sfDir> <queryName>[,<queryName>...] [--explain]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val doExplain = args.contains("--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    if (args.contains("--noaqe")) spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("ERROR")
    val reg = Queries.all.map(q => q.name -> q.run).toMap
    // --full: force EVERY output column through a hash aggregate.
    // count() lets column pruning delete a projection-only query's
    // whole expression tree (a row-local operator "benches" as a
    // metadata row count) — the hash defeats pruning, like the driver's
    // verify write does.
    val full = args.contains("--full")
    names.foreach { n =>
      // time construction + execution: operators with eager staging
      // writes (Dedup.staged) do real work during construction, so
      // timing only count() under-reports them
      val t0 = System.nanoTime()
      val df = reg(n)(spark, sfDir)
      if (doExplain) { println(s"==== $n"); df.explain("formatted") }
      val cnt = if (full) {
        import org.apache.spark.sql.functions.{col, count, lit, sum, xxhash64}
        df.select(xxhash64(df.columns.map(col).toSeq: _*).as("__h"))
          .agg(sum(col("__h")), count(lit(1))).collect()(0).getLong(1)
      } else df.count()
      println(f"TIME $n ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$cnt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

/** Dev tool: time arbitrary stages of the dedup pipeline (the round-1
  * bench hotspots) to localize regressions.
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir)
    time("docs.count")(docs.count())
    val sh = graft.operators.Dedup.shingleSet(docs, "doc_id", "text", 4)
    time("shingles")(sh.count())
    time("shingles2")(sh.count())
    val kept = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("sh")
      sh.withColumn("df", count(lit(1)).over(w)).filter(col("df") <= 100).drop("df")
    }
    time("kept")(kept.count())
    val a = kept.select(col("id").as("doc_a"), col("sh"))
    val b = kept.select(col("id").as("doc_b"), col("sh"))
    val shared = a.join(b, Seq("sh")).filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
    time("shared")(shared.count())
    time("jaccard_full")(
      graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", 4, 100, 1, 10).count())
    spark.stop()
  }
}

/** Dev tool: localize the MinHash-LSH hotspot. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir)
    val sh0 = graft.operators.Dedup.shingleSet(docs, "doc_id", "text", 4)
    val stage = java.nio.file.Files.createTempDirectory("prof_mh").toString + "/p"
    time("stage_write")(sh0.write.parquet(stage))
    val sh = spark.read.parquet(stage)
    time("stage_read_count")(sh.count())
    val k = 12; val rowsPerBand = 3
    // baseline: ONE md5 per posting row (lower bound for hash work)
    time("one_md5")(sh.select(md5(col("sh")).as("h")).agg(max("h")).collect())
    // the operator's signature stage: k conditional-min md5 columns
    val mhCols = (0 until k).map(i =>
      min(md5(concat(lit(s"$i:"), col("sh")))).as(s"mh_$i"))
    val sigs = sh.groupBy("id").agg(mhCols.head, mhCols.tail: _*)
    time("sig_agg_12md5")(sigs.count())
    val bandStructs = array((0 until k / rowsPerBand).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",",
          (0 until rowsPerBand).map(p => col(s"mh_${b * rowsPerBand + p}")): _*)).as("sig"))
    }: _*)
    val bands = sigs.select(col("id"), explode(bandStructs).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val cand = bands.select(col("id").as("doc_a"), col("band"), col("sig"))
      .join(bands.select(col("id").as("doc_b"), col("band"), col("sig")), Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    time("bands_cand")(cand.count())
    time("full")(graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text", 4, 12, 3).count())
    spark.stop()
  }
}

/** Dev tool: localize the SimHash hotspot (q33 is the largest bench item). */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.sql.functions._
    import graft.functions.TextFns
    val docs = graft.Tables.documents(spark, sfDir)
    time("docs.count")(docs.count())
    val toks = docs.repartition(16, col("doc_id"))
      .select(col("doc_id").as("id"), explode(TextFns.tokens(col("text"))).as("t"))
      .distinct()
      .withColumn("h", md5(col("t")))
    time("toks")(toks.count())
    val oddHex = Seq("1", "3", "5", "7", "9", "b", "d", "f")
    val voteCols = (0 until 32).map(j =>
      sum(when(substring(col("h"), j + 1, 1).isin(oddHex: _*), 1).otherwise(-1)).as(s"v_$j"))
    val sigExpr = (0 until 32).map(j =>
      when(col(s"v_$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    val sigPlan = toks.groupBy("id").agg(voteCols.head, voteCols.tail: _*)
      .select(col("id"), sigExpr.as("simhash"))
    time("sig_agg")(sigPlan.count())
    val st = time("sig_stage")(graft.operators.Staging.stage(sigPlan, "prof_simhash"))
    val sig = st.df
    val bandKeys = for (k1 <- 0 until 4; k2 <- k1 + 1 until 4) yield k1 * 4 + k2
    val bandvalExpr =
      "(((simhash >> ((bp div 4) * 8)) & 255) << 8) | ((simhash >> ((bp % 4) * 8)) & 255)"
    val banded = sig.select(col("id"), col("simhash"),
        explode(array(bandKeys.map(lit): _*)).as("bp"))
      .withColumn("bandval", expr(bandvalExpr))
    val joined = banded.select(col("id").as("doc_a"), col("simhash").as("sig_a"), col("bp"), col("bandval"))
      .join(banded.select(col("id").as("doc_b"), col("simhash").as("sig_b"), col("bp"), col("bandval")),
        Seq("bp", "bandval"))
      .filter(col("doc_a") < col("doc_b"))
    time("cand_join")(joined.count())
    val pairs = joined
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("int"))
      .filter(col("hamming") <= 1)
      .select("doc_a", "doc_b", "hamming").distinct()
    time("pairs_distinct")(pairs.count())
    time("full")(graft.operators.Dedup.simhashPairs(docs, "doc_id", "text", 1).count())
    time("full2")(graft.operators.Dedup.simhashPairs(docs, "doc_id", "text", 1).count())
    spark.stop()
  }
}

/** Microbenchmark: the three dot-product tiers over the embeddings
  * corpus (fixed-point exact vs composable double vs fused codegen).
  */
object ProfileDot {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val e = graft.Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 64)
      .select(col("embedding").as("qe"), col("vec_id").as("qid"))
    val pairs = q.crossJoin(e.select(col("embedding").as("ne"))).persist()
    println(s"pairs=${pairs.count()}")
    def time(tag: String)(c: org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      pairs.select(sum(c)).collect()
      println(f"TIME $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warm")(graft.expr.FloatDot.floatDot(col("qe"), col("ne")))
    time("fixed9 ")(graft.functions.VectorFns.dotFixed9(col("qe"), col("ne")).cast("double"))
    time("composed")(graft.functions.VectorFns.dotDbl(col("qe"), col("ne")))
    time("fused  ")(graft.expr.FloatDot.floatDot(col("qe"), col("ne")))
    spark.stop()
  }
}
