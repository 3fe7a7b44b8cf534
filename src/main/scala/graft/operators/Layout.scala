package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical data layout for multi-dimensional locality: Z-order (Morton)
  * interleaving.
  *
  * A table laid out by ONE sort key prunes scans on that key only; a
  * 100 TB fact table queried by two independent dimensions (price band ×
  * day, geo cell × time, …) wants file-level min/max zone maps that are
  * tight on BOTH. Interleaving the bucketized dimensions bit-by-bit into
  * one z-value and range-partitioning by it makes every output file
  * cover a small RECTANGLE of the (x, y) space, so parquet row-group
  * min/max statistics prune on either dimension — the same layout trick
  * Delta/Iceberg `OPTIMIZE ZORDER BY` applies, here as a plain
  * repartition the engine user can compose.
  */
object Layout {

  /** Morton z-value of two already-bucketized non-negative ints
    * (each < 2^bits): bit b of `x` lands at position 2b, bit b of `y` at
    * 2b+1. Pure row-local codegen'd integer arithmetic — no shuffle, no
    * UDF; the identical expression runs in any engine with shifts
    * (which is how the q76 oracle verifies it).
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xb = x.cast("long")
    val yb = y.cast("long")
    (0 until bits).map { b =>
      shiftleft(shiftright(xb, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(yb, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)
  }

  /** Cluster rows for two-dimensional locality: range-partition by the
    * z-value (one skew-free range shuffle — the partitioner samples
    * bounds), then sort within partitions so row groups inside each file
    * are tight too. Write the result partitioned/bucketed as usual;
    * readers filtering EITHER dimension skip most files on zone maps.
    */
  def zorderBy(df: DataFrame, z: Column, numPartitions: Int): DataFrame = {
    require(numPartitions >= 1, s"numPartitions must be >= 1, got $numPartitions")
    df.repartitionByRange(numPartitions, z).sortWithinPartitions(z)
  }
}
