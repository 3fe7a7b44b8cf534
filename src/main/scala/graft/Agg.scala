package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Decimal-exact aggregation helpers shared by the query surface.
  *
  * Doubles summed in different partition orders (or by a different
  * engine) differ in the last bits; decimal addition is exact and
  * associative. So: cast each element once to a fixed-scale decimal,
  * aggregate in decimal, and the result is reproducible anywhere.
  */
object Agg {
  def dec4(c: Column): Column = c.cast("decimal(18,4)")

  /** SUM(CAST(c AS DECIMAL(18,4))) widened to DECIMAL(38,4). */
  def sumDec4(c: Column): Column = sum(dec4(c)).cast("decimal(38,4)")

  /** SUM(price * (1 - discount)) in exact decimal, scale 8. */
  def sumDiscounted(price: Column, discount: Column): Column =
    sum(dec4(price) * (lit(1).cast("decimal(18,4)") - dec4(discount)))
      .cast("decimal(38,8)")
}
