package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection by Median Absolute Deviation —
  * the quality-filter pass that flags anomalous rows (absurd document
  * lengths, corrupted metric values) without letting the outliers
  * themselves poison the threshold, which is exactly what mean/stddev
  * z-scores do on heavy-tailed data.
  *
  * Medians are EXACT rank-based order statistics (the "lower median":
  * element at 0-based rank (n-1)/2 under a total order with an id
  * tie-break), so the thresholds are engine-reproducible — no float
  * summation whose order varies with partitioning. The only floats are
  * row-local IEEE ops (abs/sub/mul), identical in any engine.
  */
object Outliers {

  /** Exact lower-median of `v` per key group, via the rank trick: one
    * per-group window rank + one aggregate — no collect, no sort of the
    * whole frame.
    */
  private def lowerMedian(df: DataFrame, keys: Seq[String], v: String,
                          tie: String, out: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(v), col(tie))
    val wn = Window.partitionBy(keys.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
      .groupBy(keys.map(col): _*)
      .agg(max(when(col("__rn") === expr("(__n - 1) div 2") + 1, col(v))).as(out))
  }

  /** Rows where |value − median(group)| > k · MAD(group), emitted with
    * the group's `med`/`mad` and the row's `dev` for context.
    *
    * Plan shape: two windowed rank passes (each partitioned by the GROUP
    * key — per-group sorts, no global sort) and two broadcast joins of
    * the |groups|-sized med/mad frames back onto the fact rows. For
    * groups too hot for an exact in-partition sort at 100 TB, substitute
    * `approx_percentile(0.5)` for [[lowerMedian]] — the operator shape
    * (median → dev → median → filter) is unchanged.
    */
  def madOutliers(df: DataFrame, keys: Seq[String], valCol: String,
                  idCol: String, k: Double): DataFrame = {
    require(k > 0, s"MAD multiplier k must be positive, got $k")
    val med = lowerMedian(
      df.select((keys :+ valCol :+ idCol).map(col): _*), keys, valCol, idCol, "med")
    val dev = df.join(broadcast(med), keys)
      .withColumn("__dev", abs(col(valCol) - col("med")))
    val mad = lowerMedian(
      dev.select((keys :+ "__dev" :+ idCol).map(col): _*), keys, "__dev", idCol, "mad")
    dev.join(broadcast(mad), keys)
      .filter(col("__dev") > lit(k) * col("mad"))
      .select(keys.map(col) ++ Seq(col(idCol), col(valCol), col("med"),
        col("mad"), col("__dev").as("dev")): _*)
  }
}
