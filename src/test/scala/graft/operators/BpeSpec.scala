package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def train(texts: Seq[String], merges: Int) =
    Bpe.trainBpe(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), "doc_id", "text", merges)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)

  test("learns the classic merges on a skewed corpus") {
    // 'lolo' x3 + 'lol': pair (l,o) count = 3*2 + 1*1 = 7 beats (o,l) 3+1=4
    val m = train(Seq("lolo lolo lolo lol"), 2)
    assert(m(0)._2 == "l" && m(0)._3 == "o" && m(0)._4 == 7L)
    // after merging into 'lo': 'lolo' → [lo, lo], 'lol' → [lo, l]
    // pairs: (lo,lo) 3, (lo,l) 1 → second merge is (lo, lo)
    assert(m(1)._2 == "lo" && m(1)._3 == "lo" && m(1)._4 == 3L)
  }

  test("leftmost-non-overlapping: 'aaa' yields one merge of the first pair, not two") {
    // word 'aaa' x2: pair (a,a) count 2 per word = 4
    val m = train(Seq("aaa aaa"), 2)
    assert(m(0)._2 == "a" && m(0)._3 == "a" && m(0)._4 == 4L)
    // 'aaa' → [aa, a] (NOT [aa, aa]); next best pair is (aa, a) count 2
    assert(m(1)._2 == "aa" && m(1)._3 == "a" && m(1)._4 == 2L)
  }

  test("tie-break is lexicographic on (left, right) at equal counts") {
    // 'ba' and 'ab': pairs (b,a) and (a,b) both count 1 → (a,b) wins
    val m = train(Seq("ba ab"), 1)
    assert(m(0)._2 == "a" && m(0)._3 == "b")
  }

  test("stops early when no pairs remain") {
    // single-char words only: zero pairs, zero merges regardless of budget
    val m = train(Seq("a b c a"), 5)
    assert(m.isEmpty)
  }

  test("training is deterministic under repartitioning") {
    val texts = Seq("spark spork spark sprocket sprint spork")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val a = Bpe.trainBpe(df, "doc_id", "text", 5)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    val b = Bpe.trainBpe(df.repartition(7), "doc_id", "text", 5)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }
}
