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
  * exchange), and the per-column stats + top-value window run over
  * DISTINCT values only — the full data is touched exactly once.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"unknown columns: ${missing.mkString(", ")}")
    val longFmt = cols.map(c =>
        df.select(lit(c).as("col_name"), col(c).cast("string").as("v")))
      .reduce(_.unionByName(_))
    val byVal = longFmt.groupBy("col_name", "v").agg(count(lit(1)).as("cnt"))
    val stats = byVal.groupBy("col_name").agg(
      sum(col("cnt")).as("n_rows"),
      sum(when(col("v").isNull, col("cnt")).otherwise(0L)).as("n_nulls"),
      count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
      min(col("v")).as("min_v"),
      max(col("v")).as("max_v"))
    val wTop = Window.partitionBy("col_name").orderBy(col("cnt").desc, col("v"))
    val top = byVal.filter(col("v").isNotNull)
      .withColumn("rn", row_number().over(wTop)).filter(col("rn") === 1)
      .select(col("col_name"), col("v").as("top_v"), col("cnt").as("top_n"))
    stats.join(top, Seq("col_name"))
  }

  /** EXACT milli-quantiles per numeric column — the profiler's other
    * half (`ANALYZE` histograms): q‰ is the SMALLEST value whose
    * cumulative count reaches ⌈q·n/1000⌉ (the type-1 / lower quantile —
    * a value FROM the data, no interpolation arithmetic, so any engine
    * lands on the identical answer; the comparison `cum·1000 ≥ q·n` is
    * pure integers). Same scale shape as [[profile]]: data touched once
    * into (col, value) counts, every window runs over DISTINCT values
    * only, output is |cols|·|qs| rows.
    */
  def quantiles(df: DataFrame, cols: Seq[String],
                qMilli: Seq[Int]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    require(qMilli.nonEmpty && qMilli.forall(q => q >= 1 && q <= 1000),
      s"quantiles must be in [1,1000] milli, got $qMilli")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"unknown columns: ${missing.mkString(", ")}")
    val longFmt = cols.map(c =>
        df.select(lit(c).as("col_name"), col(c).cast("double").as("v")))
      .reduce(_.unionByName(_))
    val vc = longFmt.filter(col("v").isNotNull)
      .groupBy("col_name", "v").agg(count(lit(1)).as("cnt"))
    val cum = vc
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy("col_name").orderBy("v")))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("col_name")))
    cum.select(col("col_name"), col("v"), col("cum"), col("n"),
        explode(array(qMilli.map(q => lit(q.toLong)): _*)).as("q_milli"))
      .filter(col("cum") * 1000 >= col("q_milli") * col("n"))
      .groupBy("col_name", "q_milli").agg(min(col("v")).as("v"))
  }
}
