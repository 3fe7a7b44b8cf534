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

  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Deterministic shard assignment for a training-data release: shard
    * = md5-derived 60-bit hash of the id, mod `k`. Expected-balanced
    * (Poisson — measured max/mean occupancy in `LayoutSpec`), row-local
    * and scale-free: no global sort, no round-robin coordination, and
    * any engine recomputes the identical assignment from its own md5 —
    * which is what lets a consumer re-derive "which shard holds doc X"
    * without the manifest.
    */
  def shardAssign(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000000, s"k must be in [1, 1e6], got $k")
    df.withColumn("shard",
      h60(concat(lit("shard:"), col(idCol).cast("string"))) % k)
  }

  /** The SHARD MANIFEST a corpus release publishes next to its files:
    * per shard, the doc count, character volume, and a content digest.
    * The digest is the XOR of each row's 60-bit id:text hash —
    * commutative and combine-map-side (one aggregation shuffle of k
    * rows per map partition; no per-shard collect, no ordered
    * string_agg over corpus-sized groups — the scale trap a "digest of
    * the concatenation" would be), and it flips if ANY doc's text,
    * membership, or id changes. (XOR, not SUM: no overflow semantics
    * to align across engines.)
    *
    * Output: (shard, n_docs, sum_chars, xor_digest), k rows.
    */
  def shardManifest(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame =
    shardAssign(df, idCol, k)
      .select(col("shard"),
        length(col(textCol)).cast("long").as("nc"),
        h60(concat(col(idCol).cast("string"), lit(":"),
          md5(col(textCol)))).as("h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("sum_chars"),
        expr("bit_xor(h)").as("xor_digest"))
}
