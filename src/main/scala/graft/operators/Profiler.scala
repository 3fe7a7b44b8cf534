package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-pass data profiling (the `ANALYZE TABLE` / data-catalog
  * feature): per column — row count, null count, exact distinct count,
  * min/max, and the modal value with its frequency. Values profile
  * through their canonical STRING rendering so one operator covers
  * every column type and the result is engine-portable (both engines
  * render integers/strings identically and compare them in binary
  * order; callers profiling float columns should pre-render to a fixed
  * notation).
  *
  * Scale: the long-format explode is corpus × |cols| rows (cols is a
  * bounded operator argument), the (col, value) count aggregate
  * combines map-side (a hot value is partial-aggregated before its
  * exchange), and everything downstream is a plain aggregate over the
  * distinct-value table — NO window anywhere, so no stage ever
  * collapses a column's distinct set into one partition (a continuous
  * column's distinct count ≈ its row count, so "distinct values only"
  * is not a bound — the trap [[Tokenize]]'s vocabBuild and the old
  * top-value window both fell into).
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"unknown columns: ${missing.mkString(", ")}")
    val longFmt = cols.map(c =>
        df.select(lit(c).as("col_name"), col(c).cast("string").as("v")))
      .reduce(_.unionByName(_))
    // the distinct-value table feeds BOTH the stats and the modal-value
    // aggregates — stage once so the corpus is scanned exactly once
    val byVal = Staging.stage(
      longFmt.groupBy("col_name", "v").agg(count(lit(1)).as("cnt")),
      "prof_byval").df
    val stats = byVal.groupBy("col_name").agg(
      sum(col("cnt")).as("n_rows"),
      sum(when(col("v").isNull, col("cnt")).otherwise(0L)).as("n_nulls"),
      count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
      min(col("v")).as("min_v"),
      max(col("v")).as("max_v"))
    // modal value: min_by over the ordering struct (-cnt, v) — exactly
    // the old `row_number() OVER (ORDER BY cnt DESC, v)` winner, but as
    // a map-side-combining aggregate instead of a per-column
    // single-partition window sort of the whole distinct-value table
    val top = byVal.filter(col("v").isNotNull)
      .groupBy("col_name")
      .agg(min_by(struct(col("v"), col("cnt")),
        struct((-col("cnt")).as("nc"), col("v").as("tv"))).as("t"))
      .select(col("col_name"), col("t.v").as("top_v"), col("t.cnt").as("top_n"))
    stats.join(top, Seq("col_name"))
  }

  /** EXACT milli-quantiles per numeric column — the profiler's other
    * half (`ANALYZE` histograms): q‰ is the SMALLEST value whose
    * cumulative count reaches ⌈q·n/1000⌉ (the type-1 / lower quantile —
    * a value FROM the data, no interpolation arithmetic, so any engine
    * lands on the identical answer; the comparison `cum·1000 ≥ q·n` is
    * pure integers).
    *
    * Scale shape — a TWO-PHASE PREFIX SUM (the [[Curriculum]]
    * discipline), because a `SUM() OVER (PARTITION BY col ORDER BY v)`
    * would sort a column's ENTIRE distinct-value set in one task (for a
    * continuous column that is the corpus): the distinct values
    * range-bucket by an equi-width split of [min, max]; phase 1
    * cumulates per-BUCKET counts (a window over ≤ |cols|·`buckets`
    * rows) and binds each (col, q) target rank to the single bucket
    * whose prefix range crosses it; phase 2 cumulates values WITHIN
    * candidate buckets only (each window partition holds
    * ~distinct/`buckets` values, and only ≤ |qs| buckets per column are
    * touched). Data is read once into (col, value) counts; every later
    * stage is distinct-value scale or smaller.
    *
    * Skew caveat: equi-width buckets degrade when nearly all distinct
    * values crowd into one bucket's value range next to a far outlier —
    * raise `buckets` (cost is the phase-1 table, |cols|·buckets rows)
    * or pre-transform the column. [[Sketches.histogramQuantiles]] is
    * the approximate/streaming tier when exactness is not required.
    */
  def quantiles(df: DataFrame, cols: Seq[String], qMilli: Seq[Int],
                buckets: Int = 4096): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    require(qMilli.nonEmpty && qMilli.forall(q => q >= 1 && q <= 1000),
      s"quantiles must be in [1,1000] milli, got $qMilli")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"unknown columns: ${missing.mkString(", ")}")
    val longFmt = cols.map(c =>
        df.select(lit(c).as("col_name"), col(c).cast("double").as("v")))
      .reduce(_.unionByName(_))
    // the distinct-value table feeds the range stats, the bucket counts
    // and the within-bucket cumulate — stage once (one corpus scan)
    val vc = Staging.stage(longFmt.filter(col("v").isNotNull)
      .groupBy("col_name", "v").agg(count(lit(1)).as("cnt")), "prof_vc").df
    val rng = vc.groupBy("col_name").agg(
      min(col("v")).as("lo"), max(col("v")).as("hi"), sum(col("cnt")).as("n"))
    // deterministic monotone range bucket; NaN (sorts above everything)
    // clamps to the last bucket via the coalesce
    val bucketed = vc.join(broadcast(rng), Seq("col_name"))
      .withColumn("bk", coalesce(
        when(col("hi") <= col("lo"), lit(0L)).otherwise(
          least(greatest(floor((col("v") - col("lo")) / (col("hi") - col("lo"))
            * buckets), lit(0L)), lit(buckets - 1L))).cast("long"),
        lit(buckets - 1L)))
      .select("col_name", "v", "cnt", "bk")
    // phase 1: bucket counts + exclusive prefix (window over the BUCKET
    // table only)
    val bc = bucketed.groupBy("col_name", "bk").agg(sum(col("cnt")).as("bn"))
    val base = bc.withColumn("base", coalesce(sum(col("bn")).over(
      Window.partitionBy("col_name").orderBy("bk")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // each (col, q) target binds to the ONE bucket whose prefix range
    // crosses rank ⌈q·n/1000⌉ (integer cross-multiplied compare)
    val targets = rng.select(col("col_name"), col("n"),
      explode(array(qMilli.map(q => lit(q.toLong)): _*)).as("q_milli"))
    val cand = targets.join(base, Seq("col_name"))
      .filter(col("base") * 1000 < col("q_milli") * col("n") &&
        (col("base") + col("bn")) * 1000 >= col("q_milli") * col("n"))
      .select(col("col_name"), col("q_milli"), col("n"), col("bk"), col("base"))
    // phase 2: cumulate only inside candidate buckets (≤ |qs| per col)
    val hot = cand.select("col_name", "bk").distinct()
    val inb = bucketed.join(broadcast(hot), Seq("col_name", "bk"))
      .withColumn("cum_in", sum(col("cnt")).over(
        Window.partitionBy("col_name", "bk").orderBy("v")))
    cand.join(inb, Seq("col_name", "bk"))
      .filter((col("base") + col("cum_in")) * 1000 >= col("q_milli") * col("n"))
      .groupBy("col_name", "q_milli").agg(min(col("v")).as("v"))
  }

  /** Distribution DRIFT between two snapshots — the population-
    * stability-index (PSI) monitor data platforms run between a
    * reference window and the current one (or two versions of the same
    * table: pair with `GraftTable.readAt`): per column, equi-width
    * buckets over the REFERENCE's [min, max] (out-of-range current
    * values clamp into the edge buckets — the standard PSI convention,
    * so a shifted distribution piles up at an edge instead of escaping
    * the monitor), add-one-smoothed counts on BOTH sides, integer ppm
    * fractions (floored, clamped to ≥ 1 so the log is defined), and the
    * per-bucket contribution
    *
    *   contrib = (p_ppm − q_ppm) · (mlog2(p_ppm) − mlog2(q_ppm))
    *
    * (p = reference, q = current; the factors share sign, so every
    * contribution is ≥ 0; milli-bit × ppm integers end to end — the
    * drift score itself is engine- and partitioning-exact, unlike any
    * float-log PSI). Σ contrib per column is the PSI in mb·ppm; the
    * classic 0.1 / 0.25 nats alert thresholds scale by 1000·10⁶/ln 2.
    *
    * Scale shape: one scan per side into per-(col, bucket) counts
    * (map-side combine; |cols|·buckets result rows), then row-local
    * arithmetic on the bucket grid — drift over 100 TB costs two
    * column-pruned scans and moves only bucket-count metadata.
    */
  def distributionDrift(reference: DataFrame, current: DataFrame,
                        cols: Seq[String], buckets: Int = 10): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val missing = cols.filterNot(c =>
      reference.columns.contains(c) && current.columns.contains(c))
    require(missing.isEmpty, s"unknown columns: ${missing.mkString(", ")}")
    def longFmt(df: DataFrame) = cols.map(c =>
        df.select(lit(c).as("col_name"), col(c).cast("double").as("v")))
      .reduce(_.unionByName(_)).filter(col("v").isNotNull)
    val rng = longFmt(reference).groupBy("col_name")
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    def counts(df: DataFrame, name: String) =
      longFmt(df).join(broadcast(rng), Seq("col_name"))
        .withColumn("bk", coalesce(
          when(col("hi") <= col("lo"), lit(0L)).otherwise(
            least(greatest(floor((col("v") - col("lo")) * buckets
              / (col("hi") - col("lo"))), lit(0L)), lit(buckets - 1L)))
            .cast("long"),
          lit(buckets - 1L)))
        .groupBy("col_name", "bk").agg(count(lit(1)).as(name))
    val grid = rng.select("col_name").crossJoin(
      reference.sparkSession.range(buckets).select(col("id").as("bk")))
    def ppm(side: DataFrame, c: String, out: String) = {
      val tot = side.groupBy("col_name").agg(sum(col(c)).as("t"))
      grid.join(side, Seq("col_name", "bk"), "left")
        .join(tot, Seq("col_name"), "left")
        .select(col("col_name"), col("bk"),
          ((coalesce(col(c), lit(0L)) + 1L) * 1000000L).as("num"),
          (coalesce(col("t"), lit(0L)) + buckets).as("den"))
        // integer floor division: both operands non-negative
        .select(col("col_name"), col("bk"),
          greatest(expr("num DIV den"), lit(1L)).as(out))
    }
    val p = ppm(counts(reference, "cr"), "cr", "p_ppm")
    val q = ppm(counts(current, "cc"), "cc", "q_ppm")
    p.join(q, Seq("col_name", "bk"))
      .select(col("col_name"), col("bk"), col("p_ppm"), col("q_ppm"),
        ((col("p_ppm") - col("q_ppm")) *
          (expr(CorpusText.mlog2Sql("p_ppm")) -
            expr(CorpusText.mlog2Sql("q_ppm")))).as("contrib"))
  }
}
