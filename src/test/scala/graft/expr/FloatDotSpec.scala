package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFns

class FloatDotSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),   // 4+10+18 = 32
    (Array(0.5f, -0.5f), Array(2.0f, 2.0f)),              // 1-1 = 0
    (Array.empty[Float], Array.empty[Float])
  ).toDF("a", "b")

  test("FloatDot computes the double dot product (codegen path)") {
    val got = vecs.select(FloatDot.floatDot($"a", $"b").as("d")).as[Double].collect().toSeq
    assert(got == Seq(32.0, 0.0, 0.0))
  }

  test("FloatDot matches the composable double formulation on real embeddings") {
    val e = graft.Tables.embeddings(spark, sf001).limit(50)
    val both = e.crossJoin(e.select($"embedding".as("e2"), $"vec_id".as("v2")).limit(10))
      .select(FloatDot.floatDot($"embedding", $"e2").as("fused"),
        VectorFns.dotDbl($"embedding", $"e2").as("composed"))
      .select(max(abs($"fused" - $"composed"))).as[Double].collect().head
    assert(both < 1e-12)
  }

  test("mismatched lengths use the shorter prefix; null array yields null") {
    val got = Seq((Array(1.0f, 2.0f, 9.0f), Array(3.0f, 4.0f)))
      .toDF("a", "b")
      .select(FloatDot.floatDot($"a", $"b")).as[Double].collect().head
    assert(got == 11.0)
    val n = vecs.select(FloatDot.floatDot(lit(null).cast("array<float>"), $"b"))
      .as[java.lang.Double].collect()
    assert(n.forall(_ == null))
  }

  test("graft_dot is callable from SQL") {
    FloatDot.register(spark)
    val got = spark.sql(
      "SELECT graft_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>), CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS d")
      .as[Double].collect().head
    assert(got == 11.0)
  }
}
