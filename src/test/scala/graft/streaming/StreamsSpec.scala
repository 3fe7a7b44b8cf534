package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedCounts over a bounded stream matches the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    mem.addData(
      (ts("2024-01-01 00:05:00"), 1L), (ts("2024-01-01 00:55:00"), 2L),
      (ts("2024-01-01 01:05:00"), 3L), (ts("2024-01-01 03:05:00"), 4L))
    val agg = Streams.windowedCounts(
      mem.toDF().toDF("ts", "user_id"), "ts", "1 hour", "10 minutes")
    val out = Streams.runToCompletion(spark, agg, "complete")
      .select($"window_start".cast("string"), $"n_events")
      .as[(String, Long)].collect().toMap
    assert(out == Map(
      "2024-01-01 00:00:00" -> 2L,
      "2024-01-01 01:00:00" -> 1L,
      "2024-01-01 03:00:00" -> 1L))
    // the harness must leave nothing behind: no registered sink view,
    // no cached table pinned in the shared session
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_sink_")))
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("watermark-bounded streaming dedup drops in-horizon duplicates across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val deduped = mem.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "1 hour")
      // the production form of q52's dedup: per-key state is DROPPED
      // once the key falls behind the watermark, so state is bounded
      // by (horizon x key arrival rate), not by history
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy().count()
    val qn = s"graft_wmdedup_${System.nanoTime()}"
    val q = deduped.writeStream.outputMode("complete").format("memory").queryName(qn).start()
    mem.addData((ts("2024-01-01 00:00:00"), 1L), (ts("2024-01-01 00:00:01"), 1L))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 00:30:00"), 1L), (ts("2024-01-01 00:30:00"), 2L))
    q.processAllAvailable()
    val n = spark.table(qn).as[Long].collect().head
    q.stop()
    // 4 arrivals, id=1 delivered three times within the horizon -> 2
    assert(n === 2L)
  }

  test("sessionize emits closed sessions via event-time timeout state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Evt]
    val sessions = Streams.sessionize(
      mem.toDS().withWatermark("ts", "0 seconds").as[Streams.Evt], gapMs = 30 * 60 * 1000)
    val qn = s"sessions_${System.nanoTime()}"
    val q = sessions.writeStream.outputMode("append").format("memory").queryName(qn).start()
    // batch 1: two sessions' worth of events for user 7
    mem.addData(Streams.Evt(7L, ts("2024-01-01 00:00:00")),
      Streams.Evt(7L, ts("2024-01-01 00:10:00")))
    q.processAllAvailable()
    // batch 2: an event far past the gap → session 1 closes (in-batch split),
    // and the watermark advances past session 1's timeout
    mem.addData(Streams.Evt(7L, ts("2024-01-01 02:00:00")))
    q.processAllAvailable()
    mem.addData(Streams.Evt(8L, ts("2024-01-01 06:00:00")))
    q.processAllAvailable()
    val out = spark.table(qn).as[Streams.SessionOut].collect()
    q.stop()
    val u7 = out.filter(_.user_id == 7L)
    assert(u7.exists(s => s.session_start == ts("2024-01-01 00:00:00") && s.n_events == 2))
  }
}
