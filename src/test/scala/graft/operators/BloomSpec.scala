package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomSpec extends SparkSpec {

  test("bloom-prefiltered semi-join equals the plain semi-join exactly") {
    val s = spark
    import s.implicits._
    val probe = (1L to 1000L).map(i => (i, s"p$i")).toDF("id", "payload")
    val build = (1L to 1000L).filter(_ % 17 == 0).toDF("k")
    val got = Bloom.semiJoin(probe, "id", build, "k", k = 3, m = 4096)
      .select("id").as[Long].collect().sorted
    val exp = probe.join(build.select(col("k").as("id")), Seq("id"), "left_semi")
      .select("id").as[Long].collect().sorted
    assert(got.toSeq === exp.toSeq)
    assert(got.length === 58) // 1000/17
  }

  test("disjoint build side yields empty result (false positives removed)") {
    val s = spark
    import s.implicits._
    val probe = (1L to 500L).toDF("id")
    val build = (10000L to 10100L).toDF("k")
    assert(Bloom.semiJoin(probe, "id", build, "k", k = 3, m = 1024).count() === 0L)
  }

  test("bitmap is exactly m/64 words and not saturated for a small build side") {
    val s = spark
    import s.implicits._
    val build = (1L to 100L).toDF("k")
    val bm = Bloom.buildBitmap(build, col("k"), k = 3, m = 4096)
      .select(col("bm")).as[Seq[Long]].collect().head
    assert(bm.length === 4096 / 64)
    val popcount = bm.map(java.lang.Long.bitCount).sum
    // ≤ 300 set bits (3 per key, minus collisions) — far from saturation
    assert(popcount > 0 && popcount <= 300, s"popcount $popcount")
  }

  test("empty build side yields an all-zero bitmap and an empty result") {
    val s = spark
    import s.implicits._
    val probe = (1L to 100L).toDF("id")
    val build = (1L to 10L).toDF("k").filter(col("k") > 100)
    assert(Bloom.semiJoin(probe, "id", build, "k", 3, 1024).count() === 0L)
    val bm = Bloom.buildBitmap(build, col("k"), 3, 1024)
      .as[Seq[Long]].collect().head
    assert(bm.length === 16 && bm.forall(_ === 0L))
  }

  test("m not a multiple of 64 is rejected") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException](
      Bloom.buildBitmap((1L to 10L).toDF("k"), col("k"), 3, 1000))
  }
}
