package graft.operators

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {

  test("chunkByTokens strides with overlap and clamps the final chunk") {
    val s = spark
    import s.implicits._
    // 7 tokens, chunkSize 4, stride 3 → starts 0, 3, 6
    val docs = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val got = Chunking.chunkByTokens(docs, "doc_id", "text", 4, 3)
      .as[(Long, Long, Long, String)].collect().sortBy(_._2)
    assert(got.toSeq === Seq(
      (1L, 0L, 4L, "a b c d"),
      (1L, 3L, 4L, "d e f g"), // overlap: "d" appears in both
      (1L, 6L, 1L, "g")))      // short final chunk
  }

  test("chunkByTokens emits nothing for empty or whitespace docs, one chunk for short docs") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, ""), (2L, "   "), (3L, "only two")).toDF("doc_id", "text")
    val got = Chunking.chunkByTokens(docs, "doc_id", "text", 50, 40)
      .as[(Long, Long, Long, String)].collect()
    assert(got.toSeq === Seq((3L, 0L, 2L, "only two")))
  }

  test("chunkByTokens is shuffle-free") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Chunking.chunkByTokens(docs, "doc_id", "text", 2, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }
}
