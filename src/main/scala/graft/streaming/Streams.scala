package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured-Streaming surface generalizing the reference's incremental
  * semantics (SURVEY §2.I): the daily trigger loop (R1), the late-data
  * lookback window (R2), and the rolling correlation window (R4) map to
  * triggers, watermarks and stateful processing.
  */
object Streams {

  /** Watermarked tumbling-window aggregation (R2-style late-data bound):
    * events later than `lateness` behind the max seen event time are
    * dropped from their (closed) window.
    */
  def windowedCounts(events: DataFrame, tsCol: String, width: String,
                     lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), width))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))

  /** One user session as emitted by the custom stateful operator. */
  final case class SessionOut(user_id: Long, session_start: Timestamp, n_events: Long)
  final case class Evt(user_id: Long, ts: Timestamp)
  /** Session buffer in epoch MICROS — `Timestamp.getTime` is only
    * ms-precision and real event data carries micros; truncating would
    * shift session boundaries (two events exactly `gap` apart minus a
    * few hundred micros would wrongly split).
    */
  final case class SessionBuf(start: Long, last: Long, n: Long)

  private def toMicros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L

  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Custom session state via flatMapGroupsWithState (the mechanism the
    * reference lacks entirely — bounded per-key state with timeout-driven
    * emission): a session closes when no event arrives for `gapMs`.
    * Sessions closed by a later in-batch event emit immediately; the
    * final open session emits when the event-time watermark passes
    * last + gap (append-mode). All gap math runs at MICROsecond
    * precision; only the coarse state-timeout registration is ms.
    */
  def sessionize(events: Dataset[Evt], gapMs: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMs * 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[Evt], state: GroupState[SessionBuf]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, fromMicros(s.start), s.n))
          } else {
            val sorted = evs.map(e => toMicros(e.ts)).toSeq.sorted
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var buf = state.getOption.getOrElse(SessionBuf(sorted.head, sorted.head, 0))
            sorted.foreach { t =>
              if (t - buf.last >= gapUs) {
                closed += SessionOut(uid, fromMicros(buf.start), buf.n)
                buf = SessionBuf(t, t, 1)
              } else buf = buf.copy(last = t, n = buf.n + 1)
            }
            state.update(buf)
            // ceil to ms so the registered timeout never precedes the
            // true micros deadline
            state.setTimeoutTimestamp(Math.floorDiv(buf.last + gapUs + 999L, 1000L))
            closed.iterator
          }
      }
  }

  /** The reference's scheduler loop (R1, `runetl.py:39-66`): run `tick`
    * on a processing-time cadence with graceful stop. In Spark this is a
    * streaming query with a ProcessingTime trigger; `Trigger.AvailableNow`
    * gives the catch-up-then-exit batch mode.
    */
  def scheduledSink(source: DataFrame, cadence: String, checkpoint: String)(
      tick: (DataFrame, Long) => Unit) =
    source.writeStream
      .trigger(Trigger.ProcessingTime(cadence))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        tick(batch.toDF(), id)
      }

  /** Streaming exact dedup (the streaming form of the key-level dedup
    * U3): drop duplicate rows by key columns from an unbounded stream,
    * then aggregate. The dedup keeps per-key state; in production the
    * `withinWatermark` variant bounds that state by event time — here
    * the bounded-source test path exercises the same chained
    * stateful-dedup → aggregate topology.
    */
  def dedupedCounts(stream: DataFrame, keyCols: Seq[String], groupCol: String): DataFrame =
    stream.dropDuplicates(keyCols)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_events"))

  /** The WATERMARK-BOUNDED form of [[dedupedCounts]] — the production
    * variant on an unbounded stream: per-key dedup state is EVICTED once
    * the event-time watermark passes the key's event time plus the
    * delay, so state is O(events in the watermark window), not O(all
    * keys ever). Duplicates arriving within the window dedup exactly;
    * `tsCol` must be the event-time column the caller watermarks on.
    */
  def dedupedCountsWithinWatermark(stream: DataFrame, tsCol: String,
                                   lateness: String, keyCols: Seq[String],
                                   groupCol: String): DataFrame =
    stream.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_events"))

  /** Drive a streaming query built from a bounded source to completion
    * and return the sink table (test/backfill harness).
    *
    * State-store partition count: a streaming query instantiates one
    * state store per shuffle partition per stateful operator per
    * micro-batch — with the session's batch-sized shuffle partitioning
    * (= cores) that is pure constant overhead for small-keyspace state.
    * The partition count is captured at FIRST checkpoint and fixed for
    * the query's life, so it is a deliberate knob, not something AQE can
    * fix later: `graft.stream.statePartitions` (default
    * min(session shuffle partitions, 8) — size it to key cardinality ÷
    * target keys-per-store in production). The session conf is restored
    * after start: queries capture it at start, and callers may rely on
    * their own value.
    */
  def runToCompletion(spark: SparkSession, agg: DataFrame, mode: String): DataFrame = {
    val qn = s"graft_sink_${System.nanoTime()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val statePartitions = spark.conf.getOption("graft.stream.statePartitions")
      .map(_.toInt).getOrElse(math.min(prev.toInt, 8))
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val q =
      try agg.writeStream.outputMode(mode).format("memory").queryName(qn).start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.processAllAvailable()
    // Stabilization barrier: event-time TIMEOUTS fire in a no-data
    // micro-batch AFTER the batch that advanced the watermark, and
    // processAllAvailable can return in the gap before the engine
    // schedules it — append-mode queries with state timeouts (q120's
    // sessionizer) would then be missing their final emissions. Loop
    // until the sink row count is stable across consecutive drains
    // (complete-mode queries converge on the first extra iteration).
    var prevCount = -1L
    var curCount = spark.table(qn).count()
    var tries = 0
    while (curCount != prevCount && tries < 20) {
      Thread.sleep(200)
      q.processAllAvailable()
      prevCount = curCount
      curCount = spark.table(qn).count()
      tries += 1
    }
    // copy the sink out and RELEASE the query's session footprint: the
    // memory sink is the final aggregate of a completed bounded query —
    // driver-bounded by construction — so one collect lets us drop the
    // temp view immediately and leave nothing cached/registered behind
    // (a long test session otherwise accumulates one pinned sink table
    // per streaming run)
    val sink = spark.table(qn)
    val rows = sink.collect()
    q.stop()
    spark.catalog.dropTempView(qn)
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), sink.schema)
  }
}
