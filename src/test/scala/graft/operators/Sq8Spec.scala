package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class Sq8Spec extends SparkSpec {

  test("sq8 encode/recon hand case: 1-D corpus pins the exact integer codes") {
    val s = spark
    import s.implicits._
    val corpus = Seq((0L, Seq(0.0f)), (1L, Seq(1.0f)), (2L, Seq(0.5f)))
      .toDF("vec_id", "embedding")
    val st = SimilaritySearch.sq8Stats(corpus, "embedding")
    assert(st.as[(Int, Long, Long)].collect().toSeq === Seq((0, 0L, 1000000000L)))
    val codes = SimilaritySearch.sq8Encode(corpus, "vec_id", "embedding", st)
      .select(col("vec_id"), col("codes")(0)).as[(Long, Long)].collect().sortBy(_._1)
    // code = floor((fx-mn)*255/(mx-mn)): 0 → 0, 1e9 → 255, 5e8 → 127
    assert(codes.toSeq === Seq((0L, 0L), (1L, 255L), (2L, 127L)))
    val rec = SimilaritySearch.sq8Recon(codes.toSeq.map { case (i, c) => (i, Seq(c)) }
      .toDF("vec_id", "codes"), "vec_id", st)
      .select(col("nid"), col("rfx")(0)).as[(Long, Long)].collect().sortBy(_._1)
    // rfx = mn + floor(code*(mx-mn)/255): 0, 1e9 exactly, 127·1e9/255
    assert(rec.toSeq === Seq((0L, 0L), (1L, 1000000000L), (2L, 498039215L)))
  }

  test("constant dimensions quantize to code 0 and reconstruct exactly") {
    val s = spark
    import s.implicits._
    val corpus = Seq((0L, Seq(0.25f, 1.0f)), (1L, Seq(0.25f, 2.0f)))
      .toDF("vec_id", "embedding")
    val st = SimilaritySearch.sq8Stats(corpus, "embedding")
    val codes = SimilaritySearch.sq8Encode(corpus, "vec_id", "embedding", st)
    val rec = SimilaritySearch.sq8Recon(codes, "vec_id", st)
      .select(col("nid"), col("rfx")(0)).as[(Long, Long)].collect().toMap
    val fx = math.floor(0.25f.toDouble * 1e9).toLong
    assert(rec === Map(0L -> fx, 1L -> fx))
  }

  test("codes stay in [0, 255] and reconstruction error is within one step on real data") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(spark, sf001).limit(200)
    val st = SimilaritySearch.sq8Stats(e, "embedding")
    val codes = SimilaritySearch.sq8Encode(e, "vec_id", "embedding", st)
    val bad = codes.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") > 255).count()
    assert(bad === 0L)
    // |fx − rfx| ≤ ceil((mx−mn)/255) per dimension
    val err = e.select(col("vec_id").as("nid"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .withColumn("fx", floor(col("x").cast("double") * lit(1e9)).cast("long"))
      .join(SimilaritySearch.sq8Recon(codes, "vec_id", st)
        .select(col("nid"), posexplode(col("rfx")).as(Seq("dim", "rfx"))), Seq("nid", "dim"))
      .join(st, Seq("dim"))
      .filter(abs(col("fx") - col("rfx")) > (col("mx") - col("mn")) / 255 + 1)
      .count()
    assert(err === 0L)
  }

  test("sq8TopK reproduces exact L2 neighbors on a well-separated corpus") {
    val s = spark
    import s.implicits._
    // three tight clusters along one axis; quantization cannot confuse them
    val base = Seq(0.0f, 1.0f, 2.0f)
    val corpus = (0 until 9).map(i =>
      (i.toLong, Seq(base(i / 3) + 0.01f * (i % 3), 0.5f)))
      .toDF("vec_id", "embedding")
    val st = SimilaritySearch.sq8Stats(corpus, "embedding")
    val codes = SimilaritySearch.sq8Encode(corpus, "vec_id", "embedding", st)
    val top2 = SimilaritySearch.sq8TopK(
      corpus.filter(col("vec_id") === 0), codes, st, "vec_id", "embedding", k = 2)
      .select("nid").as[Long].collect().toSet
    assert(top2 === Set(1L, 2L)) // the rest of cluster 0
  }
}
