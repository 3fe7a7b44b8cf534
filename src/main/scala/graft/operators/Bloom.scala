package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom-filter semi-join pruning.
  *
  * Builds an m-bit Bloom filter over the build side's join keys as ONE
  * aggregated bitmap row (`array<long>` of m/64 words), broadcasts it,
  * and prefilters the probe side with k O(1) bit tests per row before
  * the exact semi-join. The final join removes Bloom false positives, so
  * the RESULT equals the plain semi-join exactly — the filter only cuts
  * how many probe rows reach the shuffle, which is the entire point at
  * scale: a 100 TB probe side against a selective build side shrinks to
  * ~the matching rows (+ fpp) BEFORE any exchange.
  *
  * This is the explicit, engine-portable (md5-hashed, deterministic)
  * form of Spark's adaptive runtime row-level filter
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`); as an operator
  * it also works across separately-staged jobs and lets the caller pin
  * m and k to the build cardinality. Memory is m/64 longs regardless of
  * build size (m = 2^20 → 16 KB broadcast); false-positive rate is
  * ~(1 − e^(−k·n/m))^k for n distinct build keys.
  */
object Bloom {

  /** k bit positions in [0, m): position i of a key is the first 8 hex
    * digits of md5("<i>:<key>") mod m — deterministic in any engine.
    */
  private def positions(key: Column, k: Int, m: Int): Seq[Column] =
    (0 until k).map(i =>
      conv(substring(md5(concat(lit(s"$i:"), key.cast("string"))), 1, 8), 16, 10)
        .cast("long") % m)

  /** One-row bitmap frame (`bm: array<long>`, length m/64) with the k
    * bits of every build key set. One explode (k rows/key) + two
    * map-side-combining aggregates (`bit_or` per word, then the dense
    * array assembly on a single row).
    */
  def buildBitmap(build: DataFrame, key: Column, k: Int, m: Int): DataFrame = {
    require(m % 64 == 0 && m > 0, s"m ($m) must be a positive multiple of 64")
    // the bitmap is embedded as a literal in the probe filter (see
    // semiJoin); 2^24 bits = 2 MB of plan payload is the sane ceiling
    require(m <= (1 << 24), s"m ($m) exceeds 2^24 bits — size k/m to the build side")
    require(k >= 1, s"k ($k) must be >= 1")
    val words = build
      .select(explode(array(positions(key, k, m): _*)).as("p"))
      .select(expr("cast(p div 64 as int)").as("w"),
        expr("shiftleft(cast(1 as bigint), cast(p % 64 as int))").as("b"))
      .groupBy("w").agg(expr("bit_or(b)").as("mask"))
    // dense array: one row, so the interpreted transform runs once
    words
      .agg(map_from_arrays(collect_list(col("w")), collect_list(col("mask"))).as("wm"))
      .select(transform(sequence(lit(0), lit(m / 64 - 1)),
        i => coalesce(element_at(col("wm"), i), lit(0L))).as("bm"))
  }

  /** Exact semi-join of `probe` against `build`'s keys, with the probe
    * side Bloom-prefiltered first. Result ≡ plain left-semi join.
    *
    * The bitmap is materialized at construction (one bounded row of
    * m/64 longs — 8 KB at m=2^16) and embedded as a LITERAL in the
    * probe-side filter. This is deliberate, and it is exactly what
    * Spark's own runtime bloom filter does when it executes its
    * ScalarSubquery: a composed cross-join-with-bitmap formulation
    * leaves two reorderable joins, and Catalyst pushes the exact
    * semi-join BELOW the prefilter (observed in the executed plan) — the
    * probe side would reach the expensive join at full volume, defeating
    * the operator. As a literal, the k bit tests form a plain Filter
    * directly above the probe scan, which no reorder can displace. The
    * bounded collect is broadcast-variable state, not a data collect.
    */
  def semiJoin(probe: DataFrame, probeKey: String, build: DataFrame,
               buildKey: String, k: Int = 3, m: Int = 1 << 16): DataFrame = {
    val bits = buildBitmap(build, col(buildKey), k, m)
      .collect()(0).getSeq[Long](0).toArray
    val posNames = (0 until k).map(i => s"__bp$i")
    val withPos = positions(col(probeKey), k, m).zip(posNames)
      .foldLeft(probe.withColumn("__bm", lit(bits))) {
        case (d, (p, nm)) => d.withColumn(nm, p.cast("int"))
      }
    // O(1) membership per position: word lookup + dynamic shift (SQL
    // array indexing is 0-based)
    val pass = posNames.map(nm =>
        expr(s"(__bm[shiftright($nm, 6)] & shiftleft(cast(1 as bigint), $nm % 64)) != 0"))
      .reduce(_ && _)
    val prefiltered = withPos.filter(pass).drop(posNames :+ "__bm": _*)
    prefiltered.join(build.select(col(buildKey).as(probeKey)), Seq(probeKey), "left_semi")
  }
}
