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

  private def trainBatched(texts: Seq[String], rounds: Int, f: Int) =
    Bpe.trainBpeBatched(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), "doc_id", "text", rounds, f)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq

  test("batched with f=1 IS the sequential trainer (rank-1 always admitted)") {
    val texts = Seq("spark spork spark sprocket sprint spork lolo lol aaa")
    assert(trainBatched(texts, 6, 1) == train(texts, 6).toSeq)
  }

  test("batched admits exactly the non-interacting prefix-checked pairs, per round") {
    // 100x 'ppqq' + 90x 'rrss'. Round-1 ranking (cnt desc, a, b):
    //   (p,p)100, (p,q)100, (q,q)100, (r,r)90, (r,s)90, (s,s)90
    // admission vs ALL higher-ranked candidates:
    //   (p,p) admit; (p,q) shares p; (q,q) shares q with (p,q);
    //   (r,r) admit; (r,s) shares r; (s,s) shares s with (r,s)
    val texts = Seq(Seq.fill(100)("ppqq").mkString(" "), Seq.fill(90)("rrss").mkString(" "))
    val round1 = trainBatched(texts, 1, 6)
    assert(round1.map(m => (m._2, m._3, m._4)) ==
      Seq(("p", "p", 100L), ("r", "r", 90L)))
    // round 2 over the rewritten state [pp,q,q] / [rr,s,s]:
    //   (pp,q)100, (q,q)100, (rr,s)90, (s,s)90 → admit (pp,q) and (rr,s)
    val round2 = trainBatched(texts, 2, 6)
    assert(round2.map(m => (m._2, m._3, m._4)) ==
      Seq(("p", "p", 100L), ("r", "r", 90L), ("pp", "q", 100L), ("rr", "s", 90L)))
    // steps numbered in (round, rank) order
    assert(round2.map(_._1) == Seq(1, 2, 3, 4))
  }

  test("batched multi-pair rewrite handles same-pair runs (the 'aaa' overlap rule)") {
    // 'aaaa bb' x3: round 1 ranks (a,a)9, (b,b)3 — disjoint, both admitted;
    // 'aaaa' must become [aa, aa] (leftmost-non-overlapping), 'bb' → [bb]
    val texts = Seq(Seq.fill(3)("aaaa bb").mkString(" "))
    val round1 = trainBatched(texts, 1, 4)
    assert(round1.map(m => (m._2, m._3, m._4)) == Seq(("a", "a", 9L), ("b", "b", 3L)))
    // round 2: state [aa,aa] / [bb] → top pair (aa,aa) count 3
    val round2 = trainBatched(texts, 2, 4)
    assert(round2.last._2 == "aa" && round2.last._3 == "aa" && round2.last._4 == 3L)
  }

  test("batched is deterministic under repartitioning") {
    val texts = Seq("spark spork spark sprocket sprint spork")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val a = Bpe.trainBpeBatched(df, "doc_id", "text", 3, 4)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    val b = Bpe.trainBpeBatched(df.repartition(7), "doc_id", "text", 3, 4)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def encode(docs: Seq[(Long, String)], merges: Int) =
    Bpe.encodeBpe(docs.toDF("doc_id", "text"), "doc_id", "text", merges)
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq

  test("encode applies the learned merges per document, in word order") {
    // corpus 'ab ab' + 'ab': merge 1 = (a,b) → every 'ab' is ONE token
    val out = encode(Seq((1L, "ab ab"), (2L, "ab")), 1)
    assert(out == Seq(
      (1L, 2L, md5hex("ab\u001Fab")),
      (2L, 1L, md5hex("ab"))))
  }

  test("encode digests distinguish segmentations (separator carries boundaries)") {
    // merge 1 here is (a,a): 'aaa' = [aa, a] (leftmost), 'a' = [a]
    val out = encode(Seq((1L, "aaa a"), (2L, "aaa")), 1)
    assert(out == Seq(
      (1L, 3L, md5hex("aa\u001Fa\u001Fa")),
      (2L, 2L, md5hex("aa\u001Fa"))))
    // the separator is what makes [aa,a] and [a,aa] hash differently —
    // an empty join would hash identical bytes for either segmentation
    assert(md5hex("aa\u001Fa") != md5hex("a\u001Faa"))
  }

  test("encode is deterministic under repartitioning and skips empty docs") {
    val docs = Seq((1L, "spark spork spark"), (2L, "  "), (3L, "sprocket sprint"))
    val df = docs.toDF("doc_id", "text")
    val a = Bpe.encodeBpe(df, "doc_id", "text", 4)
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    val b = Bpe.encodeBpe(df.repartition(5), "doc_id", "text", 4)
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a.map(_._1) == Seq(1L, 3L)) // whitespace-only doc emits no row
  }
}
