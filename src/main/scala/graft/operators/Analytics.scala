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

  /** Dense time-series re-grid: one row per (key, time bucket) across
    * the table's FULL [min, max] calendar at `unit` granularity — gap
    * buckets emitted with a zero count and the last observed value
    * forward-filled (LOCF; null until a key's first observation). The
    * resampling step every downstream window/forecast model needs,
    * since rolling computations silently skip missing buckets otherwise.
    *
    * The calendar builds from a ONE-ROW min/max aggregate crossed with
    * the distinct key set (span/unit × |keys| rows — never a rescan of
    * the fact table), the join back is on (key, bucket), and the LOCF
    * window partitions per KEY — parallel in-partition sorts bounded by
    * the calendar length, no global order anywhere.
    */
  def gapFill(events: DataFrame, keyCol: String, tsCol: String, valCol: String,
              unit: String): DataFrame = {
    require(Set("hour", "day", "week", "month").contains(unit),
      s"unit must be hour/day/week/month, got $unit")
    val bucketed = events.select(col(keyCol).as("k"),
      date_trunc(unit, col(tsCol)).as("b"), col(valCol).as("v"))
    val agg = bucketed.groupBy("k", "b")
      .agg(count(lit(1)).as("n_events"), max(col("v")).as("vmax"))
    val span = bucketed.agg(min(col("b")).as("lo"), max(col("b")).as("hi"))
    val calendar = bucketed.select("k").distinct()
      .crossJoin(broadcast(span))
      .select(col("k"), explode(expr(s"sequence(lo, hi, interval 1 $unit)")).as("b"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("b")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    calendar.join(agg, Seq("k", "b"), "left")
      .na.fill(0L, Seq("n_events"))
      .withColumn("v_ff", last(col("vmax"), ignoreNulls = true).over(w))
      .select(col("k").as(keyCol), col("b").as("bucket"), col("n_events"), col("v_ff"))
  }

  /** Grouped simple OLS regression (y = slope·x + intercept per group)
    * with EXACT integer moment sums — the regression sibling of the
    * grouped Pearson correlation (q96): inputs quantize to fixed-point
    * longs (⌊x·scale⌋, one deterministic IEEE op each), the five moment
    * sums accumulate exactly in DECIMAL(38,0) (order-independent, so
    * the result is partitioning-invariant), and the closed-form
    * solution is one identical chain of IEEE double ops in any engine:
    *
    *   slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *   intercept = (Σy − slope·Σx) / n          (in quantized units)
    *   r²        = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))
    *
    * slope and r² are scale-invariant (the quantization cancels);
    * intercept is in the quantized unit (÷scale for raw units). A group
    * with zero x-variance yields non-finite values — filter first.
    *
    * Scale shape: ONE map-side-combining aggregate over the data (five
    * sums + a count per group), then row-local arithmetic on the
    * group-count-sized result — the same cost as any grouped sum at
    * 100 TB; no second pass, no window, no collect.
    */
  def groupedOls(df: DataFrame, groupCol: String,
                 xCol: org.apache.spark.sql.Column,
                 yCol: org.apache.spark.sql.Column,
                 scale: Double = 10000.0): DataFrame = {
    val xi = floor(xCol * scale).cast("long")
    val yi = floor(yCol * scale).cast("long")
    // moment PRODUCTS promote to decimal BEFORE multiplying: a Long×Long
    // product wraps silently (non-ANSI) above ~3e9·scale, while
    // decimal(38,0)×decimal(38,0) holds any long pair exactly
    // (|long|² < 8.6e37 < 10³⁸)
    def exact(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(38,0)")).cast("double")
    def exactProd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      sum(a.cast("decimal(38,0)") * b.cast("decimal(38,0)")).cast("double")
    val covN = col("n_rows") * col("sxy") - col("sx") * col("sy")
    val varXN = col("n_rows") * col("sxx") - col("sx") * col("sx")
    val varYN = col("n_rows") * col("syy") - col("sy") * col("sy")
    val slope = covN / varXN
    df.select(col(groupCol), xi.as("xi"), yi.as("yi"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_rows"),
        exact(col("xi")).as("sx"), exact(col("yi")).as("sy"),
        exactProd(col("xi"), col("xi")).as("sxx"),
        exactProd(col("yi"), col("yi")).as("syy"),
        exactProd(col("xi"), col("yi")).as("sxy"))
      .select(col(groupCol), col("n_rows"), slope.as("slope"),
        ((col("sy") - slope * col("sx")) / col("n_rows")).as("intercept"),
        (covN * covN / (varXN * varYN)).as("r2"))
  }

  /** Time-decayed feature sums — the feature-store EWMA shape ("user
    * activity with a half-life"), in an exactly-reproducible integer
    * form: events bucket to ⌊ts/bucketWidth⌋, and the decayed sum AT
    * bucket B is Σ over source buckets b ∈ [B−maxLookback, B] of
    * (bucket-sum(b) >> (B−b)) — each bucket's exact integer sum halves
    * per elapsed bucket (arithmetic shift = floor halving, identical in
    * every engine), so the decay is bucket-granular with half-life =
    * bucketWidth. Emits one row per (key, bucket) that has events.
    *
    * Scale shape: one grouped sum to bucket level (corpus-sized input,
    * bucket-sized output), then a row-local explode of each bucket to
    * its ≤ maxLookback+1 target buckets with the shift applied AT
    * explode time (bounded fan-out — never a range join, never a
    * window), one grouped sum at bucket level, and a semi-join back to
    * real buckets. Everything shuffles on the key — co-locatable.
    * maxLookback=40 makes the window lossless for values below ~2⁴⁰
    * per bucket (contributions shift to zero before the cap bites).
    */
  def decayedSums(df: DataFrame, keyCol: String, tsMicrosCol: String,
                  valCol: String, bucketMicros: Long,
                  maxLookback: Int = 40): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive, got $bucketMicros")
    require(maxLookback >= 0 && maxLookback < 63,
      s"maxLookback must be in [0, 62], got $maxLookback")
    val sums = df
      .groupBy(col(keyCol).as("k"),
        expr(s"$tsMicrosCol DIV $bucketMicros").as("b"))
      .agg(sum(col(valCol)).cast("long").as("s"))
    val real = sums.select(col("k"), col("b").as("tb"))
    sums
      .select(col("k"), col("b"), col("s"),
        explode(expr(s"sequence(b, b + $maxLookback)")).as("tb"))
      .select(col("k"), col("tb"),
        expr("shiftright(s, CAST(tb - b AS INT))").as("c"))
      .groupBy("k", "tb")
      .agg(sum(col("c")).as("decayed"))
      .join(real, Seq("k", "tb"), "left_semi")
      .select(col("k").as(keyCol), col("tb").as("bucket"), col("decayed"))
  }
}
