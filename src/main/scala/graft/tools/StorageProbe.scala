package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.GraftTable

/** Dev/round tool: cost shapes of the round-7 storage features.
  *
  *   1. ZONE-MAP SKIPPING — a cents-banded table (8 insert-if-absent
  *      ticks, statsCols=cents): files pruned + wall for the
  *      stats-pruned range scan vs the plain full-scan filter.
  *   2. DELETION-VECTOR DELETE — wall for a tiny `deleteWhere` vs the
  *      equivalent `deleteByKeys` partition rewrite on an identical
  *      table, plus the post-DV read overhead (the anti-join tax).
  *
  * Each timing is the min of two passes (host interference windows).
  * Usage: StorageProbe <sfDir>
  */
object StorageProbe {
  private def minOf2(body: => Unit): Double = {
    def once = { val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
    math.min(once, once)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("graft_storageprobe").toString

    val rows = Tables.events(spark, sfDir).select(col("event_id"), col("user_id"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("pk", col("user_id") % 4)
      .localCheckpoint(true)
    val nBands = 8
    val band = least(floor(col("cents") / 3000), lit(nBands - 1L))

    def build(name: String, stats: Seq[String]): GraftTable = {
      val t = new GraftTable(spark, s"$base/$name", Seq("event_id"), "pk", stats)
      t.createIfNotExists(org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, user_id BIGINT, cents BIGINT, pk BIGINT"))
      for (b <- 0 until nBands) t.insertIfAbsent(rows.filter(band === b))
      t
    }

    // 1. zone-map skipping
    val t1 = build("skip", Seq("cents"))
    val live = t1.dataFileCount
    val cand = t1.candidateFiles("cents", 2000, 2999).size
    val tPruned = minOf2(t1.readWhereBetween("cents", 2000, 2999).count())
    val tFull = minOf2(
      t1.read.filter(col("cents").between(2000, 2999)).count())
    println(f"SKIP   files $cand%d/$live%d   pruned=$tPruned%.3f s   full=$tFull%.3f s")

    // 2. deletion-vector delete vs keyed partition rewrite — a mutation
    // can't repeat on the same table (the 2nd pass would be a no-op),
    // so each variant times once on each of two fresh builds, min taken
    val delKeys = rows.filter(col("event_id") % 1000 === 0)
      .select("event_id").localCheckpoint(true)
    def onceOn(name: String)(m: GraftTable => Unit): Double = {
      val t = build(name, Nil)
      val t0 = System.nanoTime()
      m(t)
      (System.nanoTime() - t0) / 1e9
    }
    val t2 = build("dv0", Nil)
    val tDv = math.min(
      { val t0 = System.nanoTime()
        t2.deleteWhere(col("event_id") % 1000 === 0)
        (System.nanoTime() - t0) / 1e9 },
      onceOn("dv1")(_.deleteWhere(col("event_id") % 1000 === 0)))
    val t3 = build("keyed0", Nil)
    val tKeyed = math.min(
      { val t0 = System.nanoTime()
        t3.deleteByKeys(delKeys)
        (System.nanoTime() - t0) / 1e9 },
      onceOn("keyed1")(_.deleteByKeys(delKeys)))
    val tReadDv = minOf2(t2.read.count())
    val tReadPlain = minOf2(t3.read.count())
    println(f"DELETE dv=$tDv%.3f s   keyedRewrite=$tKeyed%.3f s   " +
      f"readWithDv=$tReadDv%.3f s   readPlain=$tReadPlain%.3f s")
    println(s"counts: dvTable=${t2.read.count()} keyedTable=${t3.read.count()}")

    // 3. CHECKPOINT PATH (round 8): the skip table above crossed the
    // every-8th parquet checkpoint (9 commits). Measure what the r7
    // verdict's driver-cliff findings asked for:
    //   - table-open cost on a FRESH instance (manifest resolution =
    //     ckpt parquet collect + deltas, cached thereafter),
    //   - the distributed candidate pruning on the checkpoint frame,
    //   - delta-commit vs checkpoint-commit wall (the parquet
    //     checkpoint's construction cost),
    //   - commit wall with footer-harvested stats vs a stats-free
    //     commit (the removed read amplification's residual).
    val freshOpen = minOf2 {
      new GraftTable(spark, s"$base/skip", Seq("event_id"), "pk",
        Seq("cents")).read.count(); ()
    }
    val prunedDfWall = minOf2 {
      t1.candidateFiles("cents", 2000, 2999); ()
    }
    println(f"CKPT   freshOpen=$freshOpen%.3f s   dfPrune=$prunedDfWall%.3f s" +
      f"   (files $cand%d/$live%d)")
    def commitWall(name: String, stats: Seq[String], ticks: Int): Seq[Double] = {
      val t = new GraftTable(spark, s"$base/$name", Seq("event_id"), "pk", stats)
      t.createIfNotExists(org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, user_id BIGINT, cents BIGINT, pk BIGINT"))
      (0 until ticks).map { i =>
        val batch = rows.filter(col("event_id") % ticks === i)
        val t0 = System.nanoTime()
        t.insertIfAbsent(batch)
        (System.nanoTime() - t0) / 1e9
      }
    }
    val withStats = commitWall("cstats", Seq("cents"), 10)
    val noStats = commitWall("cplain", Nil, 10)
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString(" ")
    println(s"COMMIT ticks with footer stats: ${fmt(withStats)}")
    println(s"COMMIT ticks without stats:     ${fmt(noStats)}")
    // create = v1, ticks commit v2..v11 → the parquet checkpoint lands
    // on tick index 6 (version 8)
    println(f"COMMIT ckpt-tick (v8, with stats) = ${withStats(6)}%.2f s vs " +
      f"median delta-tick = ${withStats.sorted.apply(5)}%.2f s")

    // 4. STREAM BATCH PLANNING (round 9): per-batch planning cost must
    // be O(changed files), not O(live files) — fileChangesInRange
    // replays only the (s, e] delta manifests, vs the old shape that
    // resolved BOTH endpoints' live lists. Grow the live-file count
    // ~8× and compare the wall of planning a 1-commit batch.
    def streamPlanProbe(nParts: Int): (Int, Double, Double) = {
      val t = new GraftTable(spark, s"$base/stream$nParts", Seq("event_id"), "pk")
      t.createIfNotExists(org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, user_id BIGINT, cents BIGINT, pk BIGINT"))
      val wide = rows.withColumn("pk", col("user_id") % nParts)
      for (i <- 0 until 12) // 12 commits, one partition slice each
        t.insertIfAbsent(wide.filter(col("pk") % 12 === i % 12))
      val head = t.currentVersion
      val tDelta = minOf2 { t.fileChangesInRange(head - 1, head); () }
      val tLive = minOf2 { t.liveFilesAt(head); () }
      (t.dataFileCount, tDelta, tLive)
    }
    for (n <- Seq(8, 64, 256)) {
      val (files, tDelta, tLive) = streamPlanProbe(n)
      println(f"STREAM live=$files%4d files   batchPlan(delta)=" +
        f"${tDelta * 1000}%8.2f ms   liveList=${tLive * 1000}%8.2f ms")
    }

    // 5. MUTATION DISCOVERY PRUNING (round 10): a selective UPDATE /
    // DELETE on a stats-tracked column discovers its matched rows over
    // zone-map CANDIDATE files only — vs the r9 shape that filtered the
    // full live set (reproduced here with an arithmetically-wrapped,
    // unprunable predicate over the same rows).
    {
      import graft.operators.PredicatePruning
      def upd(name: String, cond: org.apache.spark.sql.Column): (Long, Long, Double) = {
        val t = build(name, Seq("cents"))
        PredicatePruning.lastMutationLiveFiles.set(-1)
        PredicatePruning.lastMutationCandidateFiles.set(-1)
        val w = { val t0 = System.nanoTime()
          t.updateWhere(cond, Map("user_id" -> (col("user_id") + 1)))
          (System.nanoTime() - t0) / 1e9 }
        (PredicatePruning.lastMutationCandidateFiles.get(),
          PredicatePruning.lastMutationLiveFiles.get(), w)
      }
      val (candU, liveU, wPruned) = upd("updp", col("cents").between(2000, 2050))
      // cents + 0 defeats the (attribute ⋈ literal) ladder → full scan
      val (_, _, wFull) = upd("updf", (col("cents") + 0).between(2000, 2050))
      println(f"MUTATE update discovery files=$candU%d/$liveU%d   " +
        f"pruned=$wPruned%.3f s   fullScanShape=$wFull%.3f s")
    }

    graft.operators.Fs.deleteTree(base)
    spark.stop()
  }
}
