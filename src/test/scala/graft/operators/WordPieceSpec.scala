package graft.operators

import graft.SparkSpec

class WordPieceSpec extends SparkSpec {

  private def seg(docs: Seq[(Long, String)], vExtra: Int): Seq[(Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    WordPiece.wordPieceSegment(docs.toDF("id", "text"), "id", "text",
      vExtra = vExtra, maxPieceLen = 4, maxWordLen = 16)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
  }

  test("greedy longest-match-first under a full substring vocabulary") {
    // "abcab" → abca + ##b (longest initial piece wins): cuts 2^4 + 2^5
    // "ab"    → ab: cuts 2^2
    assert(seg(Seq((1L, "abcab ab")), vExtra = 1000) ===
      Seq((1L, 2L, 3L, 48L + 4L)))
  }

  test("chars-only vocabulary segments to characters") {
    // "abc" → a ##b ##c: cuts 2 + 4 + 8
    assert(seg(Seq((1L, "abc")), vExtra = 0) === Seq((1L, 1L, 3L, 14L)))
  }

  test("initial and continuation roles are distinct vocabulary entries") {
    // corpus "ab xab", vExtra=1: the single multi-char slot goes to
    // "ab" in the INITIAL role (cnt ties break is_cont asc, piece asc),
    // so "xab" cannot use "##ab" and falls back to chars:
    //   "xab" → x ##a ##b (cuts 14), "ab" → ab (cuts 4)
    assert(seg(Seq((1L, "ab xab")), vExtra = 1) === Seq((1L, 2L, 4L, 18L)))
  }

  test("words over the 16-char cap are excluded from counts") {
    assert(seg(Seq((1L, ("a" * 17) + " bb")), vExtra = 1000) ===
      Seq((1L, 1L, 1L, 4L)))
  }

  test("result is partitioning-invariant") {
    val s = spark
    import s.implicits._
    val docs = graft.Tables.documents(spark, sf001).limit(40)
    val a = WordPiece.wordPieceSegment(docs, "doc_id", "text", 16, 4, 16)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = WordPiece.wordPieceSegment(docs.repartition(7), "doc_id", "text", 16, 4, 16)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }
}
