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

  /** DELETE-AWARE incremental aggregate-view maintenance — the general
    * IVM rule for `SELECT g, count(*), sum(v) GROUP BY g` under
    * arbitrary churn (the tier above [[state]]/[[merge]]'s append-only
    * folds and q139's insert deltas): given the view at the OLD
    * snapshot and both snapshots of the base table,
    *
    *   1. diff the snapshots on the key (one co-partitioned full-outer
    *      join — exchange-free over bucketed snapshots; with a
    *      versioned [[GraftTable]] feed the snapshots are `readAt`
    *      frames, so the diff reads only what the manifests name),
    *   2. every CHANGED row emits signed contributions: its old
    *      incarnation (−1, −v) to its old group, its new incarnation
    *      (+1, +v) to its new group — an update that MOVES groups
    *      maintains both sides correctly; unchanged rows emit nothing,
    *   3. fold the group-summed delta into the view, dropping groups
    *      whose count reaches zero.
    *
    * Result ≡ the direct aggregate of the new snapshot (q226 proves it
    * under the oracle after replace AND delete ticks). Cost: one diff
    * join + a churn-bounded aggregate + a view-sized merge — never a
    * rescan of the base table's unchanged keys.
    *
    * `view` must be (g, n_rows, sum_v); null groups and null values are
    * legal (null v contributes 0 to the sum, like SQL SUM).
    */
  def maintainGroupAgg(view: DataFrame, oldSnap: DataFrame,
                       newSnap: DataFrame, keys: Seq[String],
                       g: String, v: String): DataFrame = {
    require(keys.nonEmpty, "maintainGroupAgg needs key columns")
    def side(df: DataFrame, p: String) =
      df.select(keys.map(col) :+
        struct(col(g).as("g"), col(v).cast("long").as("v")).as(p): _*)
    val (o, n) = ("__ivm_o", "__ivm_n")
    val changed = side(oldSnap, o).join(side(newSnap, n), keys, "full_outer")
      .filter(!(col(o) <=> col(n))) // presence or any value differs
    val contrib = changed.select(explode(array(
        struct(col(o)("g").as("g"),
          when(col(o).isNull, 0L).otherwise(-1L).as("dn"),
          when(col(o).isNull, 0L)
            .otherwise(-coalesce(col(o)("v"), lit(0L))).as("dv")),
        struct(col(n)("g").as("g"),
          when(col(n).isNull, 0L).otherwise(1L).as("dn"),
          when(col(n).isNull, 0L)
            .otherwise(coalesce(col(n)("v"), lit(0L))).as("dv")))).as("c"))
      .select(col("c.g"), col("c.dn"), col("c.dv"))
      .filter(col("dn") =!= 0L)
      .groupBy("g").agg(sum("dn").as("dn"), sum("dv").as("dv"))
    val delta = contrib.withColumnRenamed("g", "__dg")
    view.select(col(g).as("__vg"), col("n_rows"), col("sum_v"))
      .join(delta, col("__vg") <=> col("__dg"), "full_outer")
      .select(coalesce(col("__vg"), col("__dg")).as(g),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("sum_v"), lit(0L)) + coalesce(col("dv"), lit(0L)))
          .as("sum_v"))
      .filter(col("n_rows") > 0)
  }
}
