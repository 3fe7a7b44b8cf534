package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic proportional interleaving of a multi-source corpus
  * into one global training order — stride scheduling (weighted fair
  * queueing's virtual-time rule): document r (1-based rank within its
  * source, ordered by a portable hash so the stream is shuffled) is
  * scheduled at virtual time `v = r * RESOLUTION div w_source`, and the
  * global order is ascending (v, source, r). A source with twice the
  * weight appears twice as often at every prefix of the order — the
  * mixing guarantee temperature-sampled pretraining corpora need
  * (cf. [[Sampling.mixtureSample]], which picks WHICH docs survive;
  * this operator decides the ORDER the survivors are written in).
  *
  * All arithmetic is integer; (v, source, r) is unique (r is unique per
  * source), so the order — and the emitted global position — is fully
  * deterministic in any engine.
  *
  * Scale: ranks-within-source are one window partitioned by source
  * (source count is bounded; per-source partitions can be salted by
  * pre-bucketing rank ranges if a single source dominates). The GLOBAL
  * position is NOT a single-partition window: positions come from a
  * two-phase prefix sum — bucket by `v div bucketWidth`, count per
  * bucket (a bucket-count table ~v_max/bucketWidth rows, broadcast),
  * then `pos = buckets_before + rank_within_bucket` with the
  * within-bucket window partitioned by bucket. Same shape as
  * [[Tokenize]]'s sequence packing — no global sort bottleneck; shards
  * then write out partition-by-partition in position order.
  */
object Curriculum {

  private val RES = 1000000L

  /** @param weightCol integer weight per row (>=1), usually derived
    *                   from the source column or joined from a mix
    *                   config; equal weights reduce to round-robin.
    *
    * The ranked frame feeds BOTH the bucket-count branch and the final
    * join, so it is staged once ([[Staging]]) — without that, the whole
    * upstream pipeline (often an expensive multi-gate filter chain, see
    * the q146 capstone) would evaluate twice.
    */
  def interleaveStride(docs: DataFrame, idCol: String, srcCol: String,
                       weightCol: Column, bucketWidth: Long = 50000000L): DataFrame = {
    require(bucketWidth >= 1L, s"bucketWidth must be >= 1, got $bucketWidth")
    import org.apache.spark.sql.expressions.Window
    val perSrc = Window.partitionBy(col("source")).orderBy(col("ord"), col("id"))
    val ranked = Staging.stage(docs
      .select(col(idCol).cast("long").as("id"), col(srcCol).as("source"),
        weightCol.cast("long").as("w"),
        md5(col(idCol).cast("string")).as("ord"))
      .withColumn("src_rank", row_number().over(perSrc).cast("long"))
      .withColumn("v", expr(s"(src_rank * $RES) div w"))
      .withColumn("bucket", expr(s"v div $bucketWidth")), "interleave_ranked").df
    // phase 1: docs before each bucket (bucket table is tiny — the
    // window over it is bounded by v_max/bucketWidth, not corpus size)
    val bucketBase = ranked.groupBy("bucket").agg(count(lit(1)).as("n"))
      .withColumn("base",
        coalesce(sum(col("n")).over(
          Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("n")
    // phase 2: rank within bucket (partitioned — scales with buckets)
    val inBucket = Window.partitionBy(col("bucket")).orderBy(col("v"), col("source"), col("src_rank"))
    ranked.join(broadcast(bucketBase), Seq("bucket"))
      .withColumn("pos", (col("base") + row_number().over(inBucket)).cast("long"))
      .select(col("id"), col("source"), col("src_rank"), col("v"), col("pos"))
  }
}
