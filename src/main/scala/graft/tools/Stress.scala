package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Scaling-curve harness: multiply the documents/events corpora M× (ids
  * offset; text perturbed per copy so clones are NEAR-dups; events get
  * new users and a 40-day shift per copy so per-key/per-bin density
  * stays constant) and measure each operator at each multiple.
  *
  * Reports SHUFFLE-WRITE and SCAN record counts read SYNCHRONOUSLY from
  * the executed plan's SQL metrics (walking AQE query stages), NOT from
  * a SparkListener: stage-completion events race the measurement and
  * under-count (observed: a window query's 30 k-record shuffle reported
  * as 1). Wall time is reported but untrusted — this host has
  * multi-minute external stall windows; record counts are exact. The
  * thing to check is the SHAPE: shuffle must grow ~linearly in corpus
  * size (plus the true output-pair term, which is quadratic in M by
  * construction for the dedup ops — every near-dup pair exists in M×M
  * copy combinations).
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

    // every node of the FINAL adaptive plan, descending through AQE
    // stage wrappers (their `children` is empty — a plain p.collect
    // sees nothing below a query stage). ReusedExchange is a leaf, so
    // a reused shuffle is counted exactly once, at its original stage.
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
      case q: QueryStageExec => q +: nodes(q.plan)
      case o => o +: o.children.flatMap(nodes)
    }

    // pipeline-wide shuffle-write total via task-end events: operators
    // with eager staged intermediates (Dedup, Graph.connectedComponents)
    // do real jobs at CONSTRUCTION time, outside the final plan's
    // metrics. Task-end metrics are final at event time (unlike
    // stage-completion aggregates); the residual risk is only the
    // drain latency, covered by the sleeps.
    val taskShuffle = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) taskShuffle.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    })

    def measure(tag: String)(df: => DataFrame): Unit = {
      Thread.sleep(1200) // drain the previous op's task events
      taskShuffle.set(0)
      val t0 = System.nanoTime()
      val d = df // construction: staged jobs run HERE — inside the clock
      val qe = d.queryExecution
      // drive THIS QueryExecution: df.count() would build its own, and —
      // worse — let the optimizer prune the operator away entirely
      // (count() of the as-of join needs no window column, so Catalyst
      // deletes the Window and the right union branch; the old
      // listener-based numbers measured that husk)
      val n = qe.executedPlan.execute().map(_ => 1L).fold(0L)(_ + _)
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1200) // drain this op's task events
      val ns = nodes(qe.executedPlan)
      val planShuffle = ns.collect { case s: ShuffleExchangeLike =>
        s.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L) }.sum
      val scanned = ns.collect { case f: FileSourceScanExec =>
        f.metrics.get("numOutputRows").map(_.value).getOrElse(0L) }.sum
      println(f"STRESS $tag wall=$dt%.1fs out=$n planShuffle=$planShuffle " +
        f"totalShuffle=${taskShuffle.get()} scanRec=$scanned")
    }

    def corpus(mult: Int): DataFrame = {
      val d0 = Tables.documents(spark, sfDir)
      (0 until mult).map { i =>
        d0.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          concat(col("text"), lit(s" copymark$i")).as("text"))
      }.reduce(_ unionByName _)
    }

    // events corpus M×: new users per copy and a 40-day time shift per
    // copy — growth means MORE users over MORE time (the realistic
    // shape), so per-key and per-bin density stay constant and linear
    // shuffle growth is the pass criterion
    def eventsCorpus(mult: Int): DataFrame = {
      val e0 = Tables.events(spark, sfDir)
      (0 until mult).map { i =>
        e0.select((col("event_id") + lit(i * 1000000000L)).as("event_id"),
          (col("ts") + expr(s"INTERVAL ${i * 40} DAYS")).as("ts"),
          (col("user_id") + lit(i * 1000000L)).as("user_id"),
          col("event_type"), col("value"))
      }.reduce(_ unionByName _)
    }

    mults.foreach { m =>
      val docs = corpus(m)
      println(s"== mult=$m docs=${docs.count()}")
      measure(s"m$m exact")(Dedup.fingerprintClusters(docs, "doc_id", "text"))
      measure(s"m$m jaccard")(Dedup.jaccardPairs(docs, "doc_id", "text", 4, 100 * m, 1, 10))
      measure(s"m$m minhash")(Dedup.minhashLshPairs(docs, "doc_id", "text", 4, 12, 3))
      measure(s"m$m simhash")(Dedup.simhashPairs(docs, "doc_id", "text", 1))
      measure(s"m$m winnow")(Dedup.winnowFingerprints(docs, "doc_id", "text", 8, 4))
      // near-dup clustering: edge count grows ~M² by construction here
      // (every copy pairs with every other), so the pass criterion is
      // shuffle ≈ edges + rounds·nodes, not linearity in M. (The CC
      // loop's per-round shuffles happen inside staged jobs during
      // construction; this measures the final labels frame + the count
      // of the staged output — the loop's own volume is bounded by
      // rounds × (edges + nodes) by construction.)
      measure(s"m$m cc") {
        val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", 4, 12, 3)
          .filter(col("jaccard") >= 0.2)
        graft.operators.Graph.connectedComponents(pairs, "doc_a", "doc_b")
      }
      // star-contraction CC on the same pair graph: per-round shuffle is
      // bounded by rounds · (edges + nodes) like label propagation; the
      // pass criterion is the same output-bound shape, with rounds
      // capped O(log n) instead of diameter
      measure(s"m$m ccstar") {
        val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", 4, 12, 3)
          .filter(col("jaccard") >= 0.2)
        graft.operators.Graph.connectedComponentsStar(pairs, "doc_a", "doc_b")
      }
      // segment dedup: segment-frequency table is vocabulary-sized; the
      // probe join shuffle is linear in corpus segments
      measure(s"m$m segdedup")(graft.operators.CorpusText.dropRepeatedSegments(
        docs, "doc_id", "text", " ", maxDf = 400L * m))
      // BM25: postings semi-join-pruned to the query terms — shuffle
      // tracks Σ df(query terms), linear in corpus for fixed terms
      measure(s"m$m bm25")(graft.operators.CorpusText.bm25TopK(
        docs, "doc_id", "text", Seq("spark", "dup", "key"), 20))
      // stratified sample: shuffle must stay ~CONSTANT in M
      // (k · map-partitions · strata partial rows, independent of input)
      measure(s"m$m stratified")(graft.operators.Sampling.stratifiedSample(
        docs.withColumn("g", pmod(col("doc_id"), lit(50))), "g", "doc_id", 20))
      // decontamination: benchmark set broadcasts; shuffle = per-doc
      // aggregates only — linear in corpus
      measure(s"m$m decontam")(graft.operators.Contamination.ngramOverlap(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0), "doc_id", "text", 4))
      // HLL: state ≤ m buckets/map-partition — shuffle ~constant in M
      measure(s"m$m hll")(graft.operators.Sketches.hllEstimate(
        graft.operators.Sketches.hllState(docs, "doc_id", 10), 10))
      // sequence packing: shuffle = one length row per doc (+P offsets)
      measure(s"m$m pack")(graft.operators.Tokenize.packSequences(
        docs, "doc_id", "text", 512))

      val ev = eventsCorpus(m)
      println(s"== mult=$m events=${ev.count()}")
      measure(s"m$m asof") {
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts", "value")
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id", "ts").agg(max("value").as("pv"))
        graft.operators.Relational.asofJoin(
          clicks, purchases, "user_id", "ts", "ts", Seq("pv"))
      }
      measure(s"m$m rangejoin") {
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("ts").as("err_start"),
            (col("ts") + expr("INTERVAL 5 MINUTES")).as("err_end"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("ts").as("click_ts"), col("value").as("click_value"))
        graft.operators.Relational.rangeJoinPairs(
          errors, "err_start", "err_end", clicks, "click_ts", 300L)
      }
      // funnel: every shuffle keyed on user_id — linear in events
      measure(s"m$m funnel")(graft.operators.Analytics.funnel(
        ev, "user_id", "event_type", "ts", Seq("view", "click", "purchase"), 86400L))
      // bloom semi-join: probe-side shuffle tracks MATCHES (+fpp), not
      // the probe size — the selective build side keeps it a constant
      // fraction of events
      measure(s"m$m bloom") {
        val users = ev.select(col("user_id").as("k")).distinct()
          .filter(col("k") % 37 === 0)
        graft.operators.Bloom.semiJoin(ev, "user_id", users, "k")
      }
    }
    spark.stop()
  }
}
