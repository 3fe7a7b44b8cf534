package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product-quantization encode + ADC search ([[SimilaritySearch]]). */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 4-dim vectors, m=2 subspaces of subDim=2. Seeds = ids 0 and 1.
  private val base = Seq(
    (0L, Seq(1f, 0f, 0f, 1f)),
    (1L, Seq(0f, 1f, 1f, 0f)),
    (2L, Seq(1f, 0f, 0f, 1f)),   // exact copy of seed 0
    (3L, Seq(0f, 1f, 0f, 1f)),   // sub 0 ≈ seed 1, sub 1 ≈ seed 0
    (4L, Seq(0.9f, 0.1f, 0.1f, 0.9f))) // near seed 0 in both subspaces

  private def dfOf(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "embedding")

  private def codesOf(rows: Seq[(Long, Seq[Float])]): Map[Long, Seq[Int]] = {
    val df = dfOf(rows)
    val cb = SimilaritySearch.pqSeedCodebook(df, "vec_id", "embedding", m = 2, subDim = 2, ksub = 2)
    SimilaritySearch.pqEncode(df, "vec_id", "embedding", cb, m = 2, subDim = 2)
      .as[(Long, Seq[Int])].collect().toMap
  }

  test("encode assigns each subspace to its nearest sub-centroid") {
    val codes = codesOf(base)
    assert(codes(0L) == Seq(0, 0)) // seeds quantize to themselves
    assert(codes(1L) == Seq(1, 1))
    assert(codes(2L) == Seq(0, 0)) // exact copy of seed 0
    assert(codes(3L) == Seq(1, 0)) // mixed: sub 0 → seed 1, sub 1 → seed 0
    assert(codes(4L) == Seq(0, 0)) // near seed 0 in both
  }

  test("ADC distance is zero for a query's exact PQ twin, and ranks it first") {
    val df = dfOf(base)
    val cb = SimilaritySearch.pqSeedCodebook(df, "vec_id", "embedding", m = 2, subDim = 2, ksub = 2)
    val codes = SimilaritySearch.pqEncode(df, "vec_id", "embedding", cb, m = 2, subDim = 2)
    val top = SimilaritySearch.pqTopK(df.filter(col("vec_id") === 0L), codes, cb,
        "vec_id", "embedding", k = 4, m = 2, subDim = 2)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    // query 0 IS seed 0: its LUT entry for code 0 is exactly 0 per
    // subspace, so every (0,0)-coded candidate (ids 2 and 4) gets adist 0
    assert(top.head._2 == 2L && top.head._3 == 0L)
    assert(top(1)._2 == 4L && top(1)._3 == 0L) // PQ cannot see within-cell error
    // id 3 (codes 1,0) and id 1 (codes 1,1) are strictly farther
    assert(top(2)._2 == 3L && top(2)._3 > 0L)
    assert(top(3)._2 == 1L && top(3)._3 > top(2)._3)
  }

  test("rerank sees the within-cell error ADC cannot, and keeps the exact twin first") {
    val df = dfOf(base)
    val cb = SimilaritySearch.pqSeedCodebook(df, "vec_id", "embedding", m = 2, subDim = 2, ksub = 2)
    val codes = SimilaritySearch.pqEncode(df, "vec_id", "embedding", cb, m = 2, subDim = 2)
    val top = SimilaritySearch.pqTopKRerank(df.filter(col("vec_id") === 0L), codes, df, cb,
        "vec_id", "embedding", k = 4, shortlist = 4, m = 2, subDim = 2)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    // exact re-rank: id 2 (true copy) stays dist 0; id 4 now shows its
    // real nonzero distance (ADC scored both 0 — same codes as the query)
    assert(top.map(_._2).toSeq == Seq(2L, 4L, 3L, 1L))
    assert(top(0)._3 == 0L && top(1)._3 > 0L)
  }

  test("codebook training moves sub-centroids to cluster means (one Lloyd pass)") {
    // per subspace, two tight groups; seeds (ids 0,1) both start in
    // group 1, so Lloyd must pull code 1 toward the far group
    val pts = Seq(
      (0L, Seq(0f, 0f, 10f, 10f)),
      (1L, Seq(1f, 1f, 11f, 11f)),
      (2L, Seq(4f, 4f, 14f, 14f)),
      (3L, Seq(5f, 5f, 15f, 15f)))
    val df = dfOf(pts)
    val cb1 = SimilaritySearch.pqTrainCodebook(df, "vec_id", "embedding",
      m = 2, subDim = 2, ksub = 2, iters = 1)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    // assignment at seeds (0,0)/(1,1): id0→code0, ids 1,2,3→code1
    // → code 0 stays (0,0); code 1 = mean{(1,1),(4,4),(5,5)} = (10/3, 10/3)
    assert(cb1((0, 0)) == Seq(0.0, 0.0))
    val c1 = cb1((0, 1))
    assert(math.abs(c1.head - 10.0 / 3) < 1e-9 && math.abs(c1(1) - 10.0 / 3) < 1e-9)
    // subspace 1 mirrors at +10
    assert(cb1((1, 0)) == Seq(10.0, 10.0))
    assert(math.abs(cb1((1, 1)).head - 40.0 / 3) < 1e-9)
    // after convergence (2 iters) the groups split cleanly: re-encode
    // assigns {0,1} to one code and {2,3} to the other in both subspaces
    val cb2 = SimilaritySearch.pqTrainCodebook(df, "vec_id", "embedding",
      m = 2, subDim = 2, ksub = 2, iters = 2)
    val codes = SimilaritySearch.pqEncode(df, "vec_id", "embedding", cb2, m = 2, subDim = 2)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes(0L) == codes(1L) && codes(2L) == codes(3L) && codes(0L) != codes(2L))
  }

  test("encode and search are deterministic under repartitioning") {
    val df = dfOf(base)
    val df7 = df.repartition(7)
    val cb = SimilaritySearch.pqSeedCodebook(df, "vec_id", "embedding", m = 2, subDim = 2, ksub = 2)
    val cb7 = SimilaritySearch.pqSeedCodebook(df7, "vec_id", "embedding", m = 2, subDim = 2, ksub = 2)
    def run(d: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) = {
      val codes = SimilaritySearch.pqEncode(d, "vec_id", "embedding", c, m = 2, subDim = 2)
      SimilaritySearch.pqTopK(d, codes, c, "vec_id", "embedding", k = 3, m = 2, subDim = 2)
        .as[(Long, Long, Long, Int)].collect().toSeq.sorted
    }
    assert(run(df, cb) == run(df7, cb7))
  }
}
