package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Distributed k-means (spherical: cosine assignment, the metric the IVF
  * index probes with) — the offline training job SCALE.md's IVF entry
  * defers to. Built Spark-first:
  *
  *   - assignment = broadcast centroids × streaming points, collapsed to
  *     one row per point by a map-side-combinable `max_by` BEFORE any
  *     exchange (the k-way fan-out never shuffles; a window rn=1 would
  *     shuffle k× the corpus);
  *   - centroid update = per-(cluster, dimension) mean over fixed-point
  *     element values: `floor(v·1e9)` longs sum exactly and
  *     order-independently, so the new centroids are bit-identical
  *     regardless of partitioning — and a DuckDB oracle can verify a
  *     whole Lloyd iteration;
  *   - shuffle volume per iteration = clusters × dims × map-partitions
  *     partial rows (map-side combine), independent of corpus size.
  */
object Clustering {

  /** One Lloyd iteration. `centroids` = (`cidCol`, `cvecCol`); returns
    * per-(cid, dim) rows of the updated centroids: (cid, dim, mean_val,
    * n_members). Ties in assignment break on centroid id (total order —
    * engine-reproducible). Clusters that attract no members emit no
    * rows (the standard empty-cluster drop).
    */
  def kmeansStep(points: DataFrame, idCol: String, vecCol: String,
                 centroids: DataFrame, cidCol: String, cvecCol: String): DataFrame = {
    val cent = broadcast(centroids.select(col(cidCol).as("cid"), col(cvecCol).as("cvec"),
      VectorFns.norm2Fixed9(col(cvecCol)).as("cn2")))
    val pts = points.select(col(idCol).as("pid"), col(vecCol).as("pvec"),
      VectorFns.norm2Fixed9(col(vecCol)).as("pn2"))
    val assigned = pts.join(cent)
      .select(col("pid"), col("pvec"), col("cid"),
        VectorFns.cosineFrom(VectorFns.dotFixed9(col("pvec"), col("cvec")),
          col("pn2"), col("cn2")).as("csim"))
      .groupBy("pid")
      .agg(max_by(struct(col("cid"), col("pvec")),
        struct(col("csim"), -col("cid"))).as("best"))
      .select(col("best.cid").as("cid"), col("best.pvec").as("pvec"))
    assigned
      .select(col("cid"), posexplode(col("pvec")).as(Seq("dim", "v")))
      .select(col("cid"), col("dim").cast("long").as("dim"),
        floor(col("v").cast("double") * lit(1e9)).cast("long").as("v9"))
      .groupBy("cid", "dim")
      .agg((sum(col("v9")).cast("double") / count(lit(1)) / lit(1e9)).as("mean_val"),
        count(lit(1)).as("n_members"))
  }

  /** Iterated Lloyd fit: seed = the `k` points with the smallest ids
    * (deterministic), then `iters` steps. The centroid frame is
    * re-staged every iteration to sever the iterative lineage (same
    * argument as [[Graph.connectedComponents]]). Returns (cid, cvec) —
    * possibly fewer than `k` rows if clusters emptied.
    */
  def kmeansFit(points: DataFrame, idCol: String, vecCol: String,
                k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0)
    val seed = points
      .orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("cvec"))
    var cur = Staging.stage(seed, "kmeans_seed")
    for (i <- 1 to iters) {
      val step = kmeansStep(points, idCol, vecCol, cur.df, "cid", "cvec")
      // reassemble per-dim rows into vectors; collect_list is bounded
      // by the dimension count, and array_sort orders by the struct's
      // first field (dim), so the rebuild is deterministic
      val next = step.groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("mean_val")))),
          s => s.getField("mean_val")).as("cvec"))
      val staged = Staging.stage(next, s"kmeans_$i")
      cur.delete()
      cur = staged
    }
    cur.df
  }
}
