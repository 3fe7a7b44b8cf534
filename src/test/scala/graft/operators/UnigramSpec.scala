package graft.operators

import graft.SparkSpec

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def mb(num: Long, den: Long): Long = {
    def m(x: Long) = { val l = 63 - java.lang.Long.numberOfLeadingZeros(x)
      l * 1000L + ((x - (1L << l)) * 1000L) / (1L << l) }
    m(den) - m(num)
  }

  test("hand-computed Viterbi: a productive bigram piece beats char-by-char") {
    // corpus: "abab" ×3, "ab" ×2, "ba" ×1 → with maxPieceLen=2, weighted
    // substring counts: a = 2·3+2+1 = 9, b = 9, ab = 2·3+2 = 8,
    // ba = 3+1 = 4. vExtra=2 keeps ab(8) and ba(4). T = 9+9+8+4 = 30.
    val docs = Seq((1L, "abab abab abab ab ab ba")).toDF("doc_id", "text")
    val out = Unigram.unigramSegment(docs, "doc_id", "text",
      vExtra = 2, maxPieceLen = 2, maxWordLen = 8)
      .as[(Long, Long, Long, Long)].collect().head
    // per-word optimum: "abab" → [ab, ab] (3750 mb, beats char-by-char
    // 7000 and mixed 5375); "ab" → [ab]; "ba" → [ba] (2875 < 3500)
    val cAb = mb(8, 30); val cBa = mb(4, 30)
    val expectTotal = 3 * (2 * cAb) + 2 * cAb + cBa
    val expectPieces = 3 * 2 + 2 * 1 + 1
    assert(out == ((1L, 6L, expectPieces.toLong, expectTotal)))
  }

  test("a cheap char path beats a rare multi-char piece") {
    // "aa" ×4 and "a" ×8: counts a=16, aa=4; vocab chars {a} ∪ top {aa};
    // T=20. cost(aa) = mb(4,20) = 2250 > 2·cost(a) = 2·mb(16,20) = 500:
    // chars win on cost — segmentation must be [a,a], 2 pieces.
    val docs = Seq((1L, "aa aa aa aa a a a a a a a a")).toDF("doc_id", "text")
    val out = Unigram.unigramSegment(docs, "doc_id", "text",
      vExtra = 1, maxPieceLen = 2, maxWordLen = 4)
      .as[(Long, Long, Long, Long)].collect().head
    val expect = 4L * (2 * mb(16, 20)) + 8L * mb(16, 20)
    assert(out == ((1L, 12L, 4 * 2 + 8L, expect)))
  }

  test("words over the length cap are excluded; others still segment") {
    val docs = Seq((1L, "short loooooooooooooooong ok")).toDF("doc_id", "text")
    val out = Unigram.unigramSegment(docs, "doc_id", "text",
      vExtra = 0, maxPieceLen = 2, maxWordLen = 8)
      .select("n_words").as[Long].collect().head
    assert(out == 2L) // the 21-char word is dropped by the documented cap
  }

  test("unigramEmRound: hand-computed full E/M/re-segment round") {
    // corpus "ab ab" → words {ab: wc 2}; pieces a(2), b(2), ab(2); T=6;
    // all costs mlog2(6)−mlog2(2) = 1500. Viterbi picks [ab]
    // (1500·1000+1 < 3000·1000+2). E-step path uses 'ab' twice-weighted
    // (wc=2) → usage {ab: 2}; M-step add-one: u1 = {a:1, b:1, ab:3},
    // T1 = 5 → cost1(ab) = m(5)−m(3) = 2250−1500 = 750 (cheaper: the EM
    // contraction), cost1(a)=cost1(b) = 2250 (pricier: unused).
    // Re-segment: [ab] at 750 mb → doc total = 2 words · 750.
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val out = Unigram.unigramEmRound(docs, "doc_id", "text",
      vExtra = 1, maxPieceLen = 2, maxWordLen = 4)
      .as[(Long, Long, Long, Long)].collect().head
    assert(out == ((1L, 2L, 2L, 1500L)))
  }

  test("unigramEmRound: usage re-costing flips a near-tie toward the used piece") {
    // Two words compete: "abc"×4 can go [ab,c] or [a,bc]. Initial counts
    // make one side win; after EM the used pieces get cheaper and the
    // unused ones pricier, so the winner must persist (stability) and
    // total cost must be representable. This guards the walk/usage
    // plumbing on a word with an interior split choice.
    val docs = Seq((1L, "abc abc abc abc bc bc")).toDF("doc_id", "text")
    val before = Unigram.unigramSegment(docs, "doc_id", "text",
      vExtra = 4, maxPieceLen = 2, maxWordLen = 4)
      .as[(Long, Long, Long, Long)].collect().head
    val after = Unigram.unigramEmRound(docs, "doc_id", "text",
      vExtra = 4, maxPieceLen = 2, maxWordLen = 4)
      .as[(Long, Long, Long, Long)].collect().head
    assert(before._2 == after._2, "word count is invariant under re-costing")
    assert(after._3 <= before._3,
      s"EM must not fragment the segmentation: ${after._3} vs ${before._3}")
  }

  test("argument validation") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Unigram.unigramSegment(docs, "doc_id", "text", 10, 9, 16) }
    intercept[IllegalArgumentException] {
      Unigram.unigramSegment(docs, "doc_id", "text", 10, 4, 2) }
  }
}
