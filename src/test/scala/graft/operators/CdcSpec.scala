package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CdcSpec extends SparkSpec {

  private def chunksOf(text: String, maskBits: Int = 4): Seq[(Long, Long, Long, String)] = {
    val s = spark
    import s.implicits._
    Chunking.cdcChunks(Seq((1L, text)).toDF("id", "t"), "id", "t", maskBits)
      .select(col("chunk_idx"), col("start"), col("len"), col("chunk"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
  }

  test("chunks tile the input exactly: contiguous, complete, reconstructible") {
    val text = "the quick brown fox jumps over the lazy dog " * 20
    val ch = chunksOf(text)
    assert(ch.head._2 === 0L)
    assert(ch.map(_._3).sum === text.length.toLong)
    ch.sliding(2).foreach { case Seq(a, b) => assert(b._2 === a._2 + a._3); case _ => }
    assert(ch.map(_._4).mkString === text)
    assert(ch.size > 3, s"mask 2^4 over ${text.length} bytes should cut several chunks")
  }

  test("appending a suffix never moves existing boundaries") {
    val base = "abcdefgh" * 25
    val cuts = (t: String) => chunksOf(t).map(c => c._2 + c._3).dropRight(1).toSet
    val before = cuts(base)
    val after = cuts(base + "XYZZY completely new content 12345")
    assert(before.subsetOf(after + base.length.toLong),
      s"cuts inside the original prefix must persist: $before vs $after")
  }

  test("an edit only re-cuts its 30-byte neighborhood (the CDC property)") {
    val a = "m" + ("the quick brown fox jumps over it " * 12)
    val b = "Z" + ("the quick brown fox jumps over it " * 12) // 1-byte edit at pos 0
    val cutsA = chunksOf(a).map(c => c._2 + c._3).filter(_ > 31).toSet
    val cutsB = chunksOf(b).map(c => c._2 + c._3).filter(_ > 31).toSet
    assert(cutsA === cutsB, "cuts past the hash window must be identical")
  }

  test("identical content yields identical chunk hashes across documents") {
    val s = spark
    import s.implicits._
    val shared = "shared payload that repeats everywhere " * 8
    val ch = Chunking.cdcChunks(
      Seq((1L, "A" * 40 + shared), (2L, "B" * 40 + shared)).toDF("id", "t"),
      "id", "t", 4).withColumn("h", md5(col("chunk")))
    val h1 = ch.filter(col("id") === 1).select("h").as[String].collect().toSet
    val h2 = ch.filter(col("id") === 2).select("h").as[String].collect().toSet
    // the shared tail dedups: most chunks coincide despite different prefixes
    assert(h1.intersect(h2).size >= 2,
      s"shared content must produce shared chunk hashes: $h1 vs $h2")
  }

  test("codegen variant is row-for-row identical to the mapPartitions loop") {
    val s = spark
    import s.implicits._
    val docs = graft.Tables.documents(spark, sf001)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "chunk_idx", "start", "len", "chunk")
        .as[(Long, Long, Long, Long, String)].collect().sorted.toSeq
    assert(rows(Chunking.cdcChunksCodegen(docs, "doc_id", "text", 6)) ===
      rows(Chunking.cdcChunks(docs, "doc_id", "text", 6)))
    // edge shapes: empty, single byte, boundary-at-end
    val edge = Seq((1L, ""), (2L, "x"), (3L, "abc " * 50)).toDF("doc_id", "text")
    assert(rows(Chunking.cdcChunksCodegen(edge, "doc_id", "text", 3)) ===
      rows(Chunking.cdcChunks(edge, "doc_id", "text", 3)))
    // non-ASCII routes to the byte-correct branch: the union output
    // must equal the mapPartitions loop on a MIXED corpus (umlauts,
    // CJK, emoji — multibyte UTF-8 where char-slicing would misalign)
    val mixed = Seq((1L, "plain ascii " * 30), (2L, "straße größe " * 30),
      (3L, "日本語のテキスト " * 20), (4L, "emoji 🎉 mix " * 25))
      .toDF("doc_id", "text")
    assert(rows(Chunking.cdcChunksCodegen(mixed, "doc_id", "text", 4)) ===
      rows(Chunking.cdcChunks(mixed, "doc_id", "text", 4)))
  }

  test("codegen variant: ascii hot path stays in whole-stage codegen, " +
      "typed boundary only behind the multibyte filter") {
    // parquet-backed source so nothing constant-folds away
    val docs = graft.Tables.documents(spark, sf001).select("doc_id", "text")
    val plan = Chunking.cdcChunksCodegen(docs, "doc_id", "text", 6)
      .queryExecution.executedPlan.toString
    // '*(n)' is the executedPlan rendering of a WholeStageCodegen span
    assert(plan.contains("*("), s"ascii path must codegen:\n$plan")
    assert(plan.toLowerCase.contains("gearcuts") || plan.contains("gear_cuts"),
      s"GearCuts expression expected on the hot path:\n$plan")
    // the byte-correct fallback branch exists in the plan but is gated
    // behind the multibyte filter — on an ASCII corpus it scans rows,
    // finds none, and the typed boundary processes zero rows
    assert(plan.contains("octet_length"), s"multibyte gate expected:\n$plan")
  }

  test("gear table is deterministic and in range") {
    assert(Chunking.gearTable.length === 256)
    assert(Chunking.gearTable.forall(g => g >= 0 && g < (1L << 30)))
    assert(Chunking.gearTable.distinct.length > 250, "values must spread")
  }
}
