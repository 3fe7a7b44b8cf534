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
}
