package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Agg

/** Incremental (algebraic) aggregate maintenance: keep a per-key state
  * table of partial aggregates, fold each arriving batch into it, and
  * derive the final measures at read time — never rescan history.
  *
  * count and sum are algebraic: the state is bounded per key and the
  * merge (key-wise +) is associative and commutative, so folding batches
  * in ANY order/grouping yields bit-identical state to aggregating the
  * full history at once — the property the q75 oracle checks. Averages
  * are derived (`sum/cnt`) at finish, so they stay exact; sums
  * accumulate in DECIMAL ([[graft.Agg.dec4]]) so no summation-order
  * float drift can enter the state.
  *
  * At 100 TB this is the difference between reprocessing a day's
  * partition (the delta) and reprocessing the corpus: `state(delta)` is
  * one map-side-combining aggregate over the new files, and `merge` is a
  * |keys|-sized shuffle of the two state tables (persist the result via
  * [[GraftTable.upsertMerge]]-style partition overwrite). Non-algebraic
  * measures (exact distinct, exact quantiles) need sketch states
  * (HLL/KLL) instead — out of scope for the exact tier.
  */
object Incremental {

  /** Per-key partial state over raw rows: `_cnt` + one exact-decimal
    * `_sum_<m>` per measure.
    */
  def state(raw: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame = {
    require(measures.nonEmpty, "at least one measure column is required")
    raw.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_cnt"),
        measures.map(m => sum(Agg.dec4(col(m))).as(s"_sum_$m")): _*)
  }

  /** Merge state frames key-wise (associative + commutative). */
  def merge(states: Seq[DataFrame], keys: Seq[String], measures: Seq[String]): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state frame")
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_cnt")).as("_cnt"),
        measures.map(m => sum(col(s"_sum_$m")).as(s"_sum_$m")): _*)
  }

  /** Read-time finish: row counts, DOUBLE sums, derived averages. */
  def finish(state: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame =
    state.select(keys.map(col) ++ (col("_cnt").as("n_rows") +:
      measures.flatMap(m => Seq(
        col(s"_sum_$m").cast("double").as(s"sum_$m"),
        (col(s"_sum_$m").cast("double") / col("_cnt")).as(s"avg_$m")))): _*)

  /** Incremental JOIN-VIEW maintenance for APPEND-ONLY inputs — the
    * delta-join rule materialized views run on:
    *
    *   Δ(A⋈B) = ΔA ⋈ (B ∪ ΔB)  ∪  A_old ⋈ ΔB
    *
    * (each new pair has its A-row new, or its A-row old and B-row new —
    * exactly once, so the union needs no dedup). Appending the returned
    * delta to the stored view gives exactly the full `A_new ⋈ B_new` —
    * without ever re-running `A_old ⋈ B_old` (q207 proves the
    * equivalence under the oracle).
    *
    * At 100 TB both probes are DELTA-sized on one side: ΔA against B
    * (co-located if B is bucketed on the keys) and ΔB against A_old —
    * the tick cost scales with the day's arrivals, not the view.
    * Updates/deletes need the CDC tier ([[Relational.tableDiff]] +
    * keyed rewrite) — this is the append-only fast path.
    */
  def joinDelta(aOld: DataFrame, deltaA: DataFrame,
                bOld: DataFrame, deltaB: DataFrame,
                keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "joinDelta needs at least one join key")
    deltaA.join(bOld.unionByName(deltaB), keys)
      .unionByName(aOld.join(deltaB, keys))
  }
}
