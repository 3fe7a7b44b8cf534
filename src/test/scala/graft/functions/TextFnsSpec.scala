package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("join-key normalization strips spaces and lowercases (etl.py:206)") {
    val got = Seq("Das Erste", "RTL 2", "arte").toDF("v")
      .select(TextFns.normalizeKey($"v")).as[String].collect().toSeq
    assert(got == Seq("daserste", "rtl2", "arte"))
  }

  test("resolution classifier: 5 literal classes + AVI default (etl.py:208-234)") {
    val cases = Seq(
      ".mpg.HD.avi." -> "HD",
      ".mpg.HQ.avi." -> "HQ",
      ".mpg.avi." -> "DIVX",
      ".mpg.mp4." -> "MP4",
      ".mpg.HD.ac3." -> "HD.AC3",
      ".something.else." -> "AVI")
    val got = cases.map(_._1).toDF("tok")
      .select(TextFns.classifyResolution($"tok")).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("resolution token extraction between TVOON_DE and otrkey.torrent") {
    val got = Seq("http://x/Show_21.03.05_20-15_daserste_90_TVOON_DE.mpg.HD.avi.otrkey.torrent")
      .toDF("l").select(TextFns.resolutionToken($"l")).as[String].collect().head
    assert(got == ".mpg.HD.avi.")
  }

  test("day and time keys use the reference strftime formats") {
    val got = Seq("2021-03-05 20:15:30").toDF("v")
      .select(TextFns.dayKey($"v".cast("timestamp")),
        TextFns.timeKey($"v".cast("timestamp")))
      .as[(String, String)].collect().head
    assert(got == ("2021_03_05", "21.03.05 20-15-30"))
  }

  test("fingerprint is invariant to case, punctuation and whitespace runs") {
    val fps = Seq("Hello,  World! 42", "hello world 42", "HELLO ... world    42")
      .toDF("t").select(TextFns.fingerprint($"t")).as[String].collect().toSeq
    assert(fps.distinct.size == 1)
  }

  test("lexicon hits count whole-token stopword occurrences") {
    val got = spark.range(1)
      .select(TextFns.lexiconHits(lit("The cat and the hat"), Seq("the", "and")).as("h"),
        // 'theory'/'band' must NOT count: whole-token semantics
        TextFns.lexiconHits(lit("theory of the band and"), Seq("the", "and")).as("h2"))
      .as[(Int, Int)].collect().head
    assert(got == ((3, 2)))
  }

  test("tokens: whitespace split, lowercased, empty/whitespace-only → empty array") {
    // tab/newline EDGES matter: Spark trim() strips only 0x20 spaces, so
    // a naive trim+split would emit empty edge tokens for "\tx" / "x\n"
    val got = Seq("  The  Cat\njumped ", "", "   ", "\tThe cat\t", "x\n", "\t\n")
      .toDF("t")
      .select(size(TextFns.tokens($"t")).as("n")).as[Int].collect().toSeq
    assert(got == Seq(3, 0, 0, 2, 1, 0))
  }

  private def strip(html: String): String =
    Seq(html).toDF("h").select(TextFns.stripHtml($"h")).as[String].collect().head

  test("stripHtml: script/style/comment payloads vanish, tags strip, text stays") {
    val got = strip("<html><head><style>p{x:1}</style>" +
      "<script>if(1<2)alert(1)</script></head>" +
      "<body><h1>Title</h1><p>body   text</p><!-- gone --></body></html>")
    assert(got == "Title body text")
  }

  test("stripHtml: entities decode AFTER tags, &amp; decodes LAST") {
    // &lt;b&gt; must survive as literal text '<b>' (not get tag-stripped),
    // and &amp;lt; must yield the literal '&lt;' (not doubly decode)
    assert(strip("<p>a &lt;b&gt; c</p>") == "a <b> c")
    assert(strip("<p>x &amp;lt; y</p>") == "x &lt; y")
    assert(strip("<p>A &amp; B&nbsp;&#39;q&#39; &quot;z&quot;</p>") ==
      "A & B 'q' \"z\"")
  }

  test("stripHtml: non-greedy spans stop at the first closer") {
    // two script blocks with real text between them — a greedy .* would
    // swallow the middle text
    assert(strip("<script>a()</script>keep<script>b()</script>") == "keep")
  }

  test("canonicalize folds case, accents, punctuation, and whitespace") {
    val s = spark
    import s.implicits._
    def canon(t: String): String =
      Seq(t).toDF("t").select(TextFns.canonicalize(col("t"))).as[String].collect().head
    // lowercasing runs BEFORE the fold, so uppercase accents fold too
    assert(canon("Café,  RÉSUMÉ!?") == "cafe resume")
    assert(canon("café résumé") == "cafe resume")
    assert(canon("  a\t\nb   c!! ") == "a b c")
    assert(canon("naïve señor škoda žába") == "naive senor skoda zaba")
    assert(canon("!!!") == "")
    // the accent table is well-formed
    assert(TextFns.ACCENT_FROM.length == TextFns.ACCENT_TO.length)
  }
}
