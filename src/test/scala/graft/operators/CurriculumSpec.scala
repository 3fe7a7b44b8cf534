package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(n: Int) =
    (0L until n).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")

  test("two-phase position equals the naive global row_number") {
    val docs = mkDocs(300)
    val w = expr("CAST(substring(source, 4) AS BIGINT) + 1") // weights 1,2,3
    // small bucketWidth so MANY buckets are exercised
    val out = Curriculum.interleaveStride(docs, "doc_id", "source", w, bucketWidth = 1000000L)
    val naive = out.withColumn("np",
      row_number().over(Window.orderBy(col("v"), col("source"), col("src_rank"))).cast("long"))
    assert(naive.filter(col("pos") =!= col("np")).count() == 0)
    assert(out.select("pos").distinct().count() == 300)
  }

  test("a doubled weight appears twice as often in every aligned prefix") {
    // src0 w=1, src1 w=2: after virtual time v, src1 emitted ~2x src0
    val docs = (0L until 400).map(i => (i, s"src${i % 2}")).toDF("doc_id", "source")
    val w = expr("CAST(substring(source, 4) AS BIGINT) + 1")
    val out = Curriculum.interleaveStride(docs, "doc_id", "source", w).orderBy("pos")
      .select("source").as[String].collect()
    for (prefix <- Seq(30, 90, 150)) {
      val c1 = out.take(prefix).count(_ == "src1")
      val c0 = prefix - c1
      // stride scheduling keeps the ratio tight at every prefix, not
      // just asymptotically: |c1 - 2*c0| bounded by a small constant
      assert(math.abs(c1 - 2 * c0) <= 3, s"prefix $prefix: c0=$c0 c1=$c1")
    }
  }

  test("deterministic and repartition-invariant") {
    val docs = mkDocs(120)
    val w = lit(1L)
    val a = Curriculum.interleaveStride(docs, "doc_id", "source", w)
      .orderBy("pos").select("id").as[Long].collect().toSeq
    val b = Curriculum.interleaveStride(docs.repartition(7), "doc_id", "source", w)
      .orderBy("pos").select("id").as[Long].collect().toSeq
    assert(a == b)
    // equal weights = round-robin: positions cycle through sources
    val srcs = Curriculum.interleaveStride(docs, "doc_id", "source", w)
      .orderBy("pos").select("source").as[String].collect()
    assert(srcs.grouped(3).forall(g => g.toSet.size == g.length))
  }
}
