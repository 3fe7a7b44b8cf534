package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorFnsSpec extends SparkSpec {
  import spark.implicits._

  test("jlSign matches the SQL first-hex-digit rule") {
    val md = java.security.MessageDigest.getInstance("MD5")
    for (i <- 0 until 64; k <- 0 until 8) {
      val hex = md.digest(s"${i}_${k}".getBytes("US-ASCII"))
        .map("%02x".format(_)).mkString
      val sqlSign = if ("01234567".contains(hex.head)) 1 else -1
      assert(VectorFns.jlSign(i, k) == sqlSign, s"i=$i k=$k hex=${hex.head}")
    }
    // both signs actually occur (a constant matrix projects to a line)
    val all = for (i <- 0 until 64; k <- 0 until 8) yield VectorFns.jlSign(i, k)
    assert(all.contains(1) && all.contains(-1))
  }

  test("jlCoord is the exact signed fixed-point sum") {
    val v = Seq(0.5f, -0.25f, 1.0f, 0.125f)
    val df = Seq(Tuple1(v)).toDF("emb")
    for (k <- 0 until 3) {
      val expect = v.zipWithIndex.map { case (x, i) =>
        math.floor(x.toDouble * 1e9).toLong * VectorFns.jlSign(i, k)
      }.sum
      val got = df.select(VectorFns.jlCoord($"emb", dIn = 4, k = k)).as[Long].collect().head
      assert(got == expect, s"k=$k")
    }
  }

  test("jlCoord preserves relative closeness on a simple triple") {
    // a and b are nearly identical; c is far — in ALL 8 projected
    // coordinates |p(a)−p(b)| must stay below |p(a)−p(c)| on average
    val a = Array.fill(64)(0.5f)
    val b = a.clone(); b(0) = 0.51f
    val c = Array.fill(64)(-0.5f)
    val df = Seq((1L, a.toSeq), (2L, b.toSeq), (3L, c.toSeq)).toDF("id", "emb")
    val projs = df.select(col("id") +:
        (0 until 8).map(k => VectorFns.jlCoord(col("emb"), 64, k).as(s"p$k")): _*)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toSeq).toMap
    val dAb = projs(1L).zip(projs(2L)).map { case (x, y) => (x - y).abs }.sum
    val dAc = projs(1L).zip(projs(3L)).map { case (x, y) => (x - y).abs }.sum
    assert(dAb < dAc, s"projected distances must order: $dAb vs $dAc")
  }
}
