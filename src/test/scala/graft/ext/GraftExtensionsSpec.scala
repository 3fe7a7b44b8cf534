package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFns

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.5f, -0.25f, 0.125f), Array(-1.0f, 2.0f, 4.0f))
  ).toDF("id", "a", "b")

  test("the tuned session rewrites the user-written HOF dot product to FixedDot") {
    // SparkSpec.session is GraftSession.tune'd — the rule is installed.
    // A file-backed source: a literal LocalRelation would be constant-
    // folded away before there was a plan to look at.
    val e = graft.Tables.embeddings(spark, sf001)
    val df = e.select(col("vec_id"),
      VectorFns.dotFixed9Hof(col("embedding"), col("embedding")).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.toLowerCase.contains("fixeddot"),
      s"HOF form must rewrite to the fused expression:\n$optimized")
    assert(!optimized.contains("aggregate(zip_with"),
      s"the HOF form must be gone:\n$optimized")
    // and the rewritten plan computes the same values as the fused call
    val viaRule = df.as[(Long, Long)].collect().sorted.toSeq
    val direct = e.select(col("vec_id"),
        VectorFns.dotFixed9(col("embedding"), col("embedding")).as("d"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(viaRule == direct)
  }

  test("rewritten results are bit-identical to the fused and un-rewritten forms") {
    val viaHof = vecs.select(col("id"), VectorFns.dotFixed9Hof(col("a"), col("b")).as("d"))
      .as[(Long, Long)].collect().sorted.toSeq
    val viaFused = vecs.select(col("id"), VectorFns.dotFixed9(col("a"), col("b")).as("d"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(viaHof == viaFused)
    // apply the rule MANUALLY to the analyzed plan (no session state):
    // the rewrite must produce the same rows
    val analyzed = vecs.select(col("id"), VectorFns.dotFixed9Hof(col("a"), col("b")).as("d"))
      .queryExecution.analyzed
    val rewritten = RewriteHofFixedDot(analyzed)
    assert(rewritten.toString.toLowerCase.contains("fixeddot"),
      s"manual rule application must rewrite:\n$rewritten")
  }

  test("near-miss shapes are left alone (different scale, different merge)") {
    val wrongScale = vecs.select(aggregate(
      zip_with(col("a"), col("b"),
        (x, y) => floor(x.cast("double") * y.cast("double") * lit(1e6)).cast("long")),
      lit(0L), (acc, x) => acc + x).as("d"))
    val p1 = wrongScale.queryExecution.optimizedPlan.toString
    assert(!p1.toLowerCase.contains("fixeddot"), s"1e6 scale must not rewrite:\n$p1")
    val maxMerge = vecs.select(aggregate(
      zip_with(col("a"), col("b"),
        (x, y) => floor(x.cast("double") * y.cast("double") * lit(1e9)).cast("long")),
      lit(0L), (acc, x) => greatest(acc, x)).as("d"))
    val p2 = maxMerge.queryExecution.optimizedPlan.toString
    assert(!p2.toLowerCase.contains("fixeddot"), s"max merge must not rewrite:\n$p2")
  }

  test("build-time extension hook installs the same rule") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val rules = org.apache.spark.sql.graft.Bridge.optimizerRules(ext, spark)
    assert(rules.exists(_ eq RewriteHofFixedDot))
  }
}
