package graft.operators

import graft.SparkSpec

class CorpusTextSpec extends SparkSpec {
  import spark.implicits._

  test("dropRepeatedSegments strips boilerplate lines shared across pages, keeps order") {
    val docs = Seq(
      (1L, "HOME | ABOUT\nunique article one\nfooter (c) site"),
      (2L, "HOME | ABOUT\nanother story\nmore body text\nfooter (c) site"),
      (3L, "HOME | ABOUT\nthird page body\nfooter (c) site"),
      (4L, "only original content here")
    ).toDF("doc_id", "text")
    // nav + footer appear in 3 docs; with maxDf=2 both are dropped
    val out = CorpusText.cleanSegments(docs, "doc_id", "text", "\n", maxDf = 2)
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("unique article one"))
    assert(out(2L) == Seq("another story", "more body text"))
    assert(out(4L) == Seq("only original content here"))
    val stats = CorpusText.dropRepeatedSegments(docs, "doc_id", "text", "\n", 2)
      .select("doc_id", "n_kept", "n_dropped")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(stats(2L) == ((2L, 2L)) && stats(4L) == ((1L, 0L)))
  }

  test("dropRepeatedSegments: a doc that is ALL boilerplate vanishes") {
    val docs = Seq(
      (1L, "nav\nbody a\nnav2"), (2L, "nav\nbody b\nnav2"), (3L, "nav\nnav2")
    ).toDF("doc_id", "text")
    val out = CorpusText.dropRepeatedSegments(docs, "doc_id", "text", "\n", 2)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L))
  }

  test("bigramSurprisal: repeated bigrams cost fewer bits than rare ones; single-token docs drop") {
    val docs = Seq(
      (1L, "a b a b a b a b"),  // all (a,b)/(b,a) — high-count bigrams
      (2L, "a b a b a b a b"),
      (3L, "x q"),              // a bigram seen once — rare, expensive
      (4L, "solo")              // no bigrams at all
    ).toDF("doc_id", "text")
    val out = CorpusText.bigramSurprisal(docs, "doc_id", "text")
      .select("doc_id", "n_bigrams", "bits_per_bigram")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(!out.contains(4L))
    assert(out(1L)._1 == 7L && out(3L)._1 == 1L)
    assert(out(3L)._2 > out(1L)._2,
      s"rare bigram must be more surprising: ${out(3L)._2} vs ${out(1L)._2}")
  }

  test("knSurprisal: hand-computed interpolated KN on a 2-context corpus") {
    // corpus: "a b a b a c" + "a b" → bigrams: (a,b)x3 (b,a)x2 (a,c)x1
    // pair table: 3 distinct; ctx a: c1=4, n1f=2; ctx b: c1=2, n1f=1
    // cont b: n1b=1; cont a: n1b=1; cont c: n1b=1; B=3
    // P(b|a) = [ (4*3-3)*3 + 3*2*1 ] / (4*4*3) = 33/48
    // P(a|b) = [ (4*2-3)*3 + 3*1*1 ] / (4*2*3) = 18/24
    // P(c|a) = [ (4*1-3)*3 + 3*2*1 ] / (4*4*3) =  9/48
    def mb(num: Long, den: Long): Long = {
      def m(x: Long) = { val l = 63 - java.lang.Long.numberOfLeadingZeros(x)
        l * 1000L + ((x - (1L << l)) * 1000L) / (1L << l) }
      m(den) - m(num)
    }
    val docs = Seq((1L, "a b a b a c"), (2L, "a b")).toDF("doc_id", "text")
    val out = CorpusText.knSurprisal(docs, "doc_id", "text")
      .select("doc_id", "n_bigrams", "kn_mb", "mb_per_bigram")
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    val d1 = 2 * mb(33, 48) + 2 * mb(18, 24) + mb(9, 48) // a-b b-a a-b b-a a-c
    assert(out(1L) == ((1L, 5L, d1, d1 / 5)))
    assert(out(2L) == ((2L, 1L, mb(33, 48), mb(33, 48))))
    // KN property: the novel-continuation term keeps a once-seen bigram
    // with a PRODUCTIVE context cheaper than pure discounted MLE
    assert(mb(9, 48) < mb(1, 16), "interpolation must soften the rare bigram")
  }

  test("charEntropy: uniform chars score max, single-char padding scores zero") {
    val docs = Seq(
      (1L, "abcd"),   // 4 distinct chars, uniform → exactly 2 bits/char
      (2L, "aaaa"),   // one char → zero entropy
      (3L, "")        // empty → no row
    ).toDF("doc_id", "text")
    val out = CorpusText.charEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    // doc 1: each c=1, n=4 → 4 · (mlog2(4) − mlog2(1)) = 4·2000 = 8000
    assert(out(1L) == ((1L, 4L, 8000L, 2000L)))
    assert(out(2L) == ((2L, 4L, 0L, 0L)))
    assert(!out.contains(3L))
  }

  test("bm25TopK: rare-term docs outrank stopword-only docs; tf and length matter") {
    val docs = Seq(
      (1L, "needle in the corpus"),           // rare term once, short doc
      (2L, "the the the the the the the the"),// stopword spam only
      (3L, "needle needle and more needle"),  // rare term 3x
      (4L, "the quick brown fox"),
      (5L, "unrelated words entirely")
    ).toDF("doc_id", "text")
    val out = CorpusText.bm25TopK(docs, "doc_id", "text",
        Seq("needle", "the"), k = 5)
      .select("doc_id", "score_u").as[(Long, Long)].collect()
    val order = out.map(_._1).toSeq
    // both needle docs above every the-only doc; higher tf wins
    assert(order.take(2) == Seq(3L, 1L), s"got $order")
    assert(out.map(_._1).toSet.contains(2L))
    assert(!order.contains(5L), "docs with no query term never appear")
  }

  test("bm25TopK and dropRepeatedSegments validate arguments") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      CorpusText.bm25TopK(docs, "doc_id", "text", Seq.empty, 5))
    intercept[IllegalArgumentException](
      CorpusText.bm25TopK(docs, "doc_id", "text", Seq("a"), 0))
    intercept[IllegalArgumentException](
      CorpusText.cleanSegments(docs, "doc_id", "text", "\n", 0))
  }

  test("dropDuplicatedSpans cuts a cross-doc shared substring EXACTLY, at any offset") {
    val s = spark
    import s.implicits._
    val boiler = "SHARED-BOILERPLATE-SEGMENT-XYZ" // 30 chars
    val a = "aaaa bbbb cccc " + boiler + " dddd eeee"
    val b = "ffff gggg " + boiler + " hhhh iiii jjjj"
    val docs = Seq((1L, a), (2L, b), (3L, "totally unique text here, nothing shared"))
      .toDF("doc_id", "text")
    val out = CorpusText.dropDuplicatedSpans(docs, "doc_id", "text", k = 20, minCount = 2)
      .as[(Long, Int, Long, Int, String, String)].collect().sortBy(_._1)
    // the shared substring is the boiler PLUS its flanking spaces (both
    // docs put a space on each side — 32 shared chars); windows
    // straddling past that carry unique context and must not extend
    // the span further
    assert(out(0)._6 == "aaaa bbbb cccc" + "dddd eeee")
    assert(out(0)._2 == 1 && out(0)._3 == 32L)
    assert(out(1)._6 == "ffff gggg" + "hhhh iiii jjjj")
    assert(out(2)._2 == 0 && out(2)._6 == "totally unique text here, nothing shared")
    // char accounting and digest consistency
    out.foreach { r =>
      assert(r._4 == r._6.length)
      assert(r._3 + r._4 == (if (r._1 == 1) a.length else if (r._1 == 2) b.length else r._6.length))
    }
  }

  test("dropDuplicatedSpans: WITHIN-doc repeats mark both occurrences; full dup cleans to ''") {
    val s = spark
    import s.implicits._
    val rep = "REPEATED-CHUNK-ABCDEFG-0123" // 27 chars
    val d = rep + " middle filler text " + rep
    val twin = "identical-twin-document-text-01234567890"
    val docs = Seq((1L, d), (2L, twin), (3L, twin)).toDF("doc_id", "text")
    val out = CorpusText.dropDuplicatedSpans(docs, "doc_id", "text", k = 20, minCount = 2)
      .as[(Long, Int, Long, Int, String, String)].collect().sortBy(_._1)
    // doc 1: two disjoint spans, each exactly one `rep` occurrence
    assert(out(0)._2 == 2 && out(0)._3 == 2L * rep.length)
    assert(out(0)._6 == " middle filler text ")
    // docs 2/3 duplicate each other entirely → every window repeats →
    // the whole text is one span, cleaned to the empty string
    assert(out(1)._2 == 1 && out(1)._6 == "" && out(1)._4 == 0)
    assert(out(2)._6 == "")
    // short docs (< k) pass through untouched
    val tiny = CorpusText.dropDuplicatedSpans(
      Seq((9L, "short"), (10L, "short")).toDF("doc_id", "text"), "doc_id", "text", 20, 2)
      .as[(Long, Int, Long, Int, String, String)].collect()
    assert(tiny.forall(r => r._2 == 0 && r._6 == "short"))
    intercept[IllegalArgumentException](
      CorpusText.dropDuplicatedSpans(docs, "doc_id", "text", 20, 1))
  }

  test("dedupLinesWithinDoc keeps first occurrences in original order") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "nav\nreal content\nnav\nmore text\nreal content\nnav"),
      (2L, "only\nunique\nlines")).toDF("id", "t")
    val got = CorpusText.dedupLinesWithinDoc(docs, "id", "t")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 6L, 3L, "nav\nreal content\nmore text"),
      (2L, 3L, 3L, "only\nunique\nlines")))
  }

  test("trigramSearch: all-trigram candidates, exact verify separates false positives") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the batch stream runs"),   // true match
      (2L, "batch scan then stream"),  // all trigrams of 'batch stream', not the substring
      (3L, "nothing here")).toDF("id", "t")
    val got = CorpusText.trigramSearch(docs, "id", "t", "batch stream")
      .as[(Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, true), (2L, false)))
    // short patterns fall back to the exact scan ("the", "then", "here")
    val short = CorpusText.trigramSearch(docs, "id", "t", "he")
      .as[(Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(short === Seq((1L, true), (2L, true), (3L, true)))
  }

  test("phraseSearch counts exact adjacent occurrences only") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b a b a"),      // 'a b' twice
      (2L, "a x b a"),        // words present, never adjacent
      (3L, "b a")).toDF("id", "t")
    val got = CorpusText.phraseSearch(docs, "id", "t", Seq("a", "b"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 2L)))
    // three-word phrase with overlap semantics
    val tri = CorpusText.phraseSearch(Seq((1L, "a a a a")).toDF("id", "t"),
      "id", "t", Seq("a", "a", "a")).as[(Long, Long)].collect().toSeq
    assert(tri === Seq((1L, 2L)))
  }

  test("worstSurprisalSpan finds the rare-bigram region; short docs drop") {
    val s = spark
    import s.implicits._
    // common bigrams everywhere except one doc's rare middle stretch
    val common = "a b " * 10
    val docs = Seq(
      (1L, common.trim),                        // all common bigrams
      (2L, (("a b " * 4) + "x q z w v " + ("a b " * 4)).trim), // rare middle
      (3L, "a b")).toDF("id", "t")              // 1 bigram < window → drops
    val got = CorpusText.worstSurprisalSpan(docs, "id", "t", window = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) === Seq(1L, 2L))
    val byId = got.map(r => r._1 -> r).toMap
    // doc 2's worst span must start inside the rare stretch (positions 8..12)
    assert(byId(2L)._2 >= 7 && byId(2L)._2 <= 12, s"worst span at ${byId(2L)._2}")
    // and must out-score doc 1's best-possible (all-common) span
    assert(byId(2L)._3 > byId(1L)._3)
  }

  test("dedupLinesWithinDoc is per-document: same line in two docs survives in both") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "shared\nx"), (2L, "shared\ny")).toDF("id", "t")
    val got = CorpusText.dedupLinesWithinDoc(docs, "id", "t")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got.map(_._4) === Seq("shared\nx", "shared\ny"))
  }

  test("mainContentBlocks: link-dense nav dies, real text survives, short blocks die, order kept") {
    val s = spark
    import s.implicits._
    val html = "<div><a href=\"/\">Home page</a> <a href=\"/b\">Blog roll</a></div>" +
      "<p>first real paragraph of content</p>" +
      "<div>tiny</div>" +
      "<p>second longer paragraph with an inline <a href=\"/x\">link</a> in it</p>"
    val docs = Seq((1L, html)).toDF("id", "h")
    val out = CorpusText.mainContentBlocks(docs, "id", "h",
        minChars = 10, maxLinkMilli = 300)
      .as[(Long, Long, Long, Long, String)].collect().head
    val (_, nBlocks, nKept, keptChars, digest) = out
    // nav: text 19 chars but ~19 link chars → 1000 milli → dropped;
    // tiny: 4 chars → dropped; paragraph 2: link "link" = 4 of 51 chars
    // ≈ 78 milli → kept
    assert(nKept == 2L, s"blocks=$nBlocks kept=$nKept")
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(("first real paragraph of content " +
        "second longer paragraph with an inline link in it").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(digest == expected, "kept blocks must digest in page order")
    assert(keptChars ==
      "first real paragraph of content".length +
        "second longer paragraph with an inline link in it".length)
    // a page that is ALL boilerplate keeps nothing and digests empty
    val none = CorpusText.mainContentBlocks(
      Seq((2L, "<div><a href=\"/\">Home page link</a></div>")).toDF("id", "h"),
      "id", "h", 10, 300)
      .as[(Long, Long, Long, Long, String)].collect().head
    assert(none._3 == 0L && none._4 == 0L &&
      none._5 == "d41d8cd98f00b204e9800998ecf8427e")
  }
}
