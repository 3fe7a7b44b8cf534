package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketches for cardinality and frequency at 100 TB — the
  * sub-linear-state tier the exact operators (q17 distinct counts, q58
  * exact quantiles) escalate to when per-key exactness stops fitting.
  *
  * Both sketches here are ENGINE-PORTABLE by construction (the same
  * deliberate md5 discipline as the MinHash/SimHash operators): the hash
  * is the first 15 hex digits of md5 (60 bits — fits a signed long), bit
  * lengths come from `bin()` string lengths, and the HLL harmonic sum is
  * an INTEGER (Σ 2^(maxExp−rho) via shifts — a float sum of powers would
  * round order-dependently and break cross-engine equality). So even the
  * ESTIMATES hash-match a DuckDB oracle — unusual for sketches, and what
  * lets the driver verify them.
  */
object Sketches {

  /** 60-bit md5-derived hash of a key (15 hex digits → positive long). */
  private def h60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  // ---------------------------------------------------------------- HLL

  /** HyperLogLog state over a key column: m = 2^b buckets, one row per
    * OCCUPIED bucket with the max rho (1 + leading zeros of the
    * (60−b)-bit hash suffix; all-zero suffix → 60−b+1). State is ≤ m
    * rows regardless of input size; map-side combining max.
    */
  def hllState(df: DataFrame, keyCol: String, b: Int): DataFrame = {
    require(b >= 4 && b <= 16, s"bucket bits b must be in [4, 16], got $b")
    val m = 1 << b
    val maxRho = 60 - b + 1
    df.select(h60(col(keyCol)).as("h"))
      .select((col("h") % m).as("bucket"), expr(s"h div $m").as("suffix"))
      .groupBy("bucket")
      .agg(max(when(col("suffix") === 0, lit(maxRho))
        .otherwise(lit(maxRho) - length(bin(col("suffix"))))).as("rho"))
  }

  /** Union of HLL states (bucket-wise max) — the distributed combine:
    * per-partition/per-day sketches merge into the global one without
    * touching raw data again.
    */
  def hllMerge(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "hllMerge needs at least one state")
    states.reduce(_ unionByName _).groupBy("bucket").agg(max(col("rho")).as("rho"))
  }

  /** Raw HLL estimate α_m·m²/Σ2^(−rho), computed over the EXACT integer
    * sum S = Σ 2^(maxExp−rho) (empty buckets contribute 2^maxExp):
    * (m_used, s, est_distinct). Raw estimator — valid for n ≳ 5/2·m;
    * below that, switch to linear counting on m_used (deliberately not
    * fused here: ln() is not correctly-rounded across engines).
    */
  def hllEstimate(state: DataFrame, b: Int): DataFrame = {
    val m = 1 << b
    val maxExp = 60 - b + 1
    // ((0.7213/(1+1.079/m))·m)·m — powers-of-two multiplies are exact,
    // so the only roundings are the two divisions, identical anywhere
    val alphaM2 = 0.7213 / (1 + 1.079 / m) * m * m
    state
      .agg(count(lit(1)).as("m_used"),
        sum(expr(s"shiftleft(cast(1 as bigint), $maxExp - rho)")).as("s_used"))
      .select(col("m_used"),
        (col("s_used") + (lit(m.toLong) - col("m_used")) * lit(1L << maxExp)).as("s"))
      .select(col("m_used"), col("s"),
        (lit(alphaM2) * lit((1L << maxExp).toDouble) / col("s")).as("est_distinct"))
  }

  // --------------------------------------------------------- Count-min

  /** Count-min sketch state over a key column: d rows × w columns of
    * counters, counter (i, md5_i(key) mod w) incremented per input row.
    * One d-way explode + one map-side-combining count — state is ≤ d·w
    * cells regardless of input; merge = cell-wise sum (just union states
    * into [[cmsState]]'s aggregate shape and re-sum).
    */
  def cmsState(df: DataFrame, keyCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1 rows and w >= 2 columns, got ($d, $w)")
    val cells = (0 until d).map(i => struct(lit(i).as("r"),
      (conv(substring(md5(concat(lit(s"$i:"), col(keyCol).cast("string"))), 1, 15), 16, 10)
        .cast("long") % w).as("c")))
    df.select(explode(array(cells: _*)).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point frequency estimates for `keys`: min over the d counters —
    * an upper bound on the true count (≥, with overestimate probability
    * shrinking as (n_collisions/w)^d). The d·w-cell state broadcasts.
    */
  def cmsLookup(state: DataFrame, keys: DataFrame, keyCol: String,
                d: Int, w: Int): DataFrame = {
    val cells = (0 until d).map(i => struct(lit(i).as("r"),
      (conv(substring(md5(concat(lit(s"$i:"), col(keyCol).cast("string"))), 1, 15), 16, 10)
        .cast("long") % w).as("c")))
    keys.select(col(keyCol).as("key"), explode(array(cells: _*)).as("rc"))
      .select(col("key"), col("rc.r").as("r"), col("rc.c").as("c"))
      .join(broadcast(state), Seq("r", "c"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy("key").agg(min(col("cnt")).as("est"))
  }
}
