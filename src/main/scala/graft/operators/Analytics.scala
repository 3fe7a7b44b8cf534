package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral event analytics: ordered funnels and cohort retention —
  * the product-analytics counterpart of the window family (q24-q27).
  */
object Analytics {

  /** Ordered k-step funnel with a per-step conversion window: a user
    * reaches step i+1 when an event of that type occurs in
    * [t_i, t_i + window] where t_i is the user's time of REACHING step i
    * (first step: first event of that type at all). Returns one row per
    * step: (step, event_type, n_users).
    *
    * Plan shape: each step is one filtered scan + an equi-join on the
    * user key + a per-user min aggregate — every shuffle is on the same
    * user key, so a pre-bucketed event table co-locates the whole chain
    * with ZERO join exchanges; per-user state is a single timestamp.
    * Steps are sequential by definition (step i+1 needs t_i), so plan
    * depth = funnel length, not data volume.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
             steps: Seq[String], windowSec: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(windowSec > 0, s"conversion window must be positive, got $windowSec")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("u")).agg(min(col(tsCol)).as("t"))
    val reached = steps.tail.scanLeft(first) { (prev, step) =>
      events.filter(col(typeCol) === step)
        .select(col(userCol).as("u"), col(tsCol).as("ts2"))
        .join(prev, Seq("u"))
        .filter(col("ts2") >= col("t") &&
          col("ts2") <= col("t") + expr(s"INTERVAL $windowSec SECOND"))
        .groupBy("u").agg(min(col("ts2")).as("t"))
    }
    reached.zip(steps).zipWithIndex.map { case ((df, step), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step"), lit(step).as("event_type"), col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** Cohort retention: users bucketed by first-seen day; per
    * (cohort day, day offset) distinct-user activity counts — the
    * retention-curve input. Two shuffles total: the per-user first-seen
    * aggregate and the final (cohort, offset) distinct count; the join
    * back is on the same user key as the first aggregate (co-located
    * when bucketed).
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val first = events.groupBy(col(userCol).as("u"))
      .agg(min(to_date(col(tsCol))).as("cohort"))
    events.select(col(userCol).as("u"), to_date(col(tsCol)).as("day"))
      .join(first, Seq("u"))
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).cast("long").as("day_offset"))
      .agg(countDistinct(col("u")).as("n_users"))
  }

  /** First-order transition counts between event types along each
    * user's time-ordered stream — the Markov-chain / next-event-model
    * input. One lag window PER USER (per-user in-partition sort, never a
    * global order) + one map-side-combining count; `tieCol` breaks
    * equal-timestamp ties so the sequence is a total order and the
    * counts are engine-deterministic.
    */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    events.withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }
}
