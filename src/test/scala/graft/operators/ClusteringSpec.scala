package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {

  test("kmeansFit separates two angular clusters and converges to their means") {
    val s = spark
    import s.implicits._
    // two tight cosine clusters: near the x-axis and near the y-axis.
    // seeds (smallest two ids) land one in each cluster.
    val pts = Seq(
      (0L, Seq(1.0f, 0.01f)), (2L, Seq(0.9f, 0.02f)), (4L, Seq(1.1f, 0.0f)),
      (1L, Seq(0.01f, 1.0f)), (3L, Seq(0.02f, 0.9f)), (5L, Seq(0.0f, 1.1f))
    ).toDF("vec_id", "embedding")
    val cents = Clustering.kmeansFit(pts, "vec_id", "embedding", k = 2, iters = 3)
      .orderBy("cid").collect()
    assert(cents.length === 2)
    val c0 = cents(0).getSeq[Double](1)
    val c1 = cents(1).getSeq[Double](1)
    // cluster 0 = x-dominant mean of {(1,.01),(0.9,.02),(1.1,0)}
    assert(math.abs(c0.head - 1.0) < 1e-6 && math.abs(c0(1) - 0.01) < 1e-6)
    // cluster 1 = y-dominant
    assert(math.abs(c1.head - 0.01) < 1e-6 && math.abs(c1(1) - 1.0) < 1e-6)
  }

  test("kmeansStep drops empty clusters and counts members per cluster") {
    val s = spark
    import s.implicits._
    val pts = Seq(
      (10L, Seq(1.0f, 0.0f)), (11L, Seq(0.99f, 0.01f))
    ).toDF("vec_id", "embedding")
    // centroid 7 points away from every point → attracts nothing
    val cents = Seq((3L, Seq(1.0f, 0.0f)), (7L, Seq(-1.0f, 0.0f)))
      .toDF("cid", "cvec")
    val out = Clustering.kmeansStep(pts, "vec_id", "embedding", cents, "cid", "cvec")
    val byCid = out.groupBy("cid").agg(max("n_members").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(byCid === Map(3L -> 2L))
    assert(out.filter(col("dim") === 0 && col("cid") === 3).count() === 1L)
  }

  test("kmeansStep assignment is partitioning-invariant (fixed-point arithmetic)") {
    val s = spark
    import s.implicits._
    val e = graft.Tables.embeddings(spark, sf001)
    val cents = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val a = Clustering.kmeansStep(e, "vec_id", "embedding", cents, "cid", "cvec")
      .orderBy("cid", "dim").collect()
    val b = Clustering.kmeansStep(e.repartition(13), "vec_id", "embedding", cents, "cid", "cvec")
      .orderBy("cid", "dim").collect()
    assert(a.toSeq === b.toSeq)
  }
}
