package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation joins. AQE's skew-join splitting handles most hot-key
  * cases at runtime; explicit salting remains the tool when one side
  * must be replicated deterministically (e.g. a dimension join where a
  * handful of keys dominate — the classic power-law fact table).
  *
  * `saltedJoin` replicates the SMALL side `salts` times and scatters the
  * big side's hot keys uniformly across the replicas, so a key that owns
  * 30% of the fact table spreads over `salts` tasks instead of one.
  */
object Skew {

  /** Inner/left equi-join with salting: big side gets a random-free,
    * DETERMINISTIC salt from a row hash (reproducible runs), small side
    * is exploded ×salts. Result columns = big ++ small (minus join key
    * duplicate), exactly like `big.join(small, keys)`.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // deterministic scatter: hash of ALL big-side columns mod salts
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(salts)).cast("int"))
    val smallExploded = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    bigSalted.join(smallExploded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group keys:
    * aggregate per (key, salt) first, then merge per key. For algebraic
    * aggregates Spark's own partial aggregation already does this; the
    * explicit form matters for holistic aggregates (e.g. collect-based)
    * where a hot key would otherwise concentrate on one task.
    */
  def saltedCount(df: DataFrame, key: Column, salts: Int): DataFrame =
    // salt must vary WITHIN a key (a key-hash salt would re-concentrate
    // the hot key on one task): scatter by row position. The salt value
    // itself depends on the input partitioning — only the merged final
    // counts are stable, which is all this operator promises.
    df.groupBy(key.as("k"), pmod(monotonically_increasing_id(), lit(salts)).as("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy("k").agg(sum("__partial").as("n"))
}
