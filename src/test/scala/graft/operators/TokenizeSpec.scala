package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TokenizeSpec extends SparkSpec {

  test("vocabBuild ranks by frequency with lexicographic ties and caps the size") {
    val s = spark
    import s.implicits._
    val toks = (Seq.fill(3)("b") ++ Seq.fill(3)("a") ++ Seq.fill(1)("z") ++ Seq.fill(2)("m"))
      .toDF("term")
    val v = Tokenize.vocabBuild(toks, "term", maxSize = 3)
      .as[(String, Long, Long)].collect().sortBy(_._3)
    // a and b tie at 3 → a first; z (count 1) falls off the cap
    assert(v.toSeq === Seq(("a", 3L, 0L), ("b", 3L, 1L), ("m", 2L, 2L)))
  }

  test("vocabBuild cuts the long tail before the global sort when " +
      "distinct-term count >> maxSize") {
    val s = spark
    import s.implicits._
    // 20 hot terms with distinct counts + 5000 singleton junk terms:
    // the histogram threshold must drop the junk before the rank
    // window, and the kept ids must equal the unfiltered ranking
    val hot = (0 until 20).flatMap(i => Seq.fill(100 - i)(f"hot_$i%02d"))
    val junk = (0 until 5000).map(i => s"junk_$i")
    val toks = (hot ++ junk).toDF("term")
    val v10 = Tokenize.vocabBuild(toks, "term", maxSize = 10)
      .as[(String, Long, Long)].collect().sortBy(_._3)
    assert(v10.map(_._1).toSeq === (0 until 10).map(i => f"hot_$i%02d"))
    assert(v10.map(_._2).toSeq === (0 until 10).map(i => (100 - i).toLong))
    // cap lands INSIDE the count-1 tie group: lexicographically first
    // junk terms fill the remaining slots ("junk_0" < "junk_1" < "junk_10")
    val v22 = Tokenize.vocabBuild(toks, "term", maxSize = 22)
      .as[(String, Long, Long)].collect().sortBy(_._3)
    assert(v22.length === 22)
    assert(v22.drop(20).map(_._1).toSeq === Seq("junk_0", "junk_1"))
  }

  test("encodeDocs preserves token order and encodes OOV as -1") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b a rare b"), (2L, "b b"), (3L, "   ")).toDF("doc_id", "text")
    val vocab = Tokenize.vocabBuild(
      docs.select(explode(graft.functions.TextFns.tokens(col("text"))).as("term")),
      "term", maxSize = 2)
    // counts: b=4, a=2, rare=1 → vocab b→0, a→1; rare is OOV
    val out = Tokenize.encodeDocs(docs, "doc_id", "text", vocab)
      .as[(Long, Long, Seq[Long])].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out(1L) === ((5L, Seq(1L, 0L, 1L, -1L, 0L))))
    assert(out(2L) === ((2L, Seq(0L, 0L))))
    assert(!out.contains(3L)) // whitespace-only doc has no tokens
  }

  test("packSequences cuts the concatenated stream into exact ctx-token bins") {
    val s = spark
    import s.implicits._
    // doc lengths 3, 4, 2 in id order; ctx=4 → stream of 9 tokens:
    // bin0 = [0,4): doc1(3) + doc2(1); bin1 = [4,8): doc2(3) + doc3(1); bin2 = doc3(1)
    val docs = Seq((1L, "x x x"), (2L, "y y y y"), (3L, "z z")).toDF("doc_id", "text")
    val out = Tokenize.packSequences(docs, "doc_id", "text", ctx = 4)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (0L, 4L, 2L, 1L, 2L),
      (1L, 4L, 2L, 2L, 3L),
      (2L, 1L, 1L, 3L, 3L)))
  }

  test("packSequences is partitioning-invariant and conserves tokens") {
    val s = spark
    import s.implicits._
    val docs = (1L to 200L).map(i => (i, ("w " * ((i % 13).toInt + 1)).trim)).toDF("doc_id", "text")
    val a = Tokenize.packSequences(docs, "doc_id", "text", 32)
      .as[(Long, Long, Long, Long, Long)].collect().sorted
    val b = Tokenize.packSequences(docs.repartition(11), "doc_id", "text", 32)
      .as[(Long, Long, Long, Long, Long)].collect().sorted
    assert(a.toSeq === b.toSeq)
    val total = (1L to 200L).map(_ % 13 + 1).sum
    assert(a.map(_._2).sum === total)
    // every bin except the last holds exactly ctx tokens
    assert(a.dropRight(1).forall(_._2 === 32L))
  }

  test("invertedIndex: ordered postings, df cap drops hot terms") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (2L, "x y x"), (1L, "x z"), (3L, "x x x")
    ).toDF("doc_id", "text")
    // df: x=3, y=1, z=1 → cap 2 drops x
    val out = Tokenize.invertedIndex(docs, "doc_id", "text", dfCap = 2)
      .collect().map { r =>
        (r.getString(0), r.getLong(1), r.getLong(2),
          r.getSeq[org.apache.spark.sql.Row](3).map(p => (p.getLong(0), p.getLong(1))))
      }.map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(!out.contains("x"))
    assert(out("y") === ((1L, 1L, Seq((2L, 1L)))))
    assert(out("z") === ((1L, 1L, Seq((1L, 1L)))))
  }

  test("invertedIndex postings sort by (doc, position)") {
    val s = spark
    import s.implicits._
    val docs = Seq((9L, "a b a"), (4L, "a")).toDF("doc_id", "text")
    val out = Tokenize.invertedIndex(docs, "doc_id", "text", dfCap = 10)
      .filter(col("term") === "a")
      .collect().head.getSeq[org.apache.spark.sql.Row](3)
      .map(p => (p.getLong(0), p.getLong(1)))
    assert(out.toSeq === Seq((4L, 0L), (9L, 0L), (9L, 2L)))
  }

  test("degenerate parameters are rejected") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Tokenize.packSequences(docs, "doc_id", "text", 0))
    intercept[IllegalArgumentException](
      Tokenize.vocabBuild(docs.select(col("text").as("term")), "term", 0))
  }
}
