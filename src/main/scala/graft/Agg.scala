package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Decimal-exact aggregation helpers shared by the query surface.
  *
  * Doubles summed in different partition orders (or by a different
  * engine) differ in the last bits; decimal addition is exact and
  * associative. So: cast each element once to a fixed-scale decimal,
  * aggregate in decimal — reproducible anywhere — then cast the FINAL
  * result to DOUBLE. Any engine casting the same exact decimal picks
  * the same nearest double, so output schemas stay engine-portable
  * (decimal128 parquet vs native DECIMAL render differently downstream).
  */
object Agg {
  def dec4(c: Column): Column = c.cast("decimal(18,4)")

  /** SUM(CAST(c AS DECIMAL(18,4))), exact, rendered as DOUBLE. */
  def sumDec4(c: Column): Column = sum(dec4(c)).cast("double")

  /** SUM(price * (1 - discount)) in exact decimal scale 8, rendered as DOUBLE. */
  def sumDiscounted(price: Column, discount: Column): Column =
    sum(dec4(price) * (lit(1).cast("decimal(18,4)") - dec4(discount)))
      .cast("double")
}
