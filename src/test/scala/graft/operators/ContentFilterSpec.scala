package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ContentFilterSpec extends SparkSpec {
  import spark.implicits._

  private def statsOf(text: String): Row =
    ContentFilter.gopherStats(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text").collect()(0)

  test("gopherStats counts lines, bullets, ellipses, symbols, alpha words, stopwords") {
    val r = statsOf("- the quick brown fox ...\njumps over the lazy dog\n- see more ... #")
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    assert(m("n_lines") == 3L)
    assert(m("n_bullet") == 2L)
    // line 1 ends '...', line 3 ends '#' (its '...' is mid-line)
    assert(m("n_ellipsis_lines") == 1L)
    // two '...' (3 chars each -> 2) + one '#'
    assert(m("n_symbols") == 3L)
    assert(m("n_words") == 16L)
    // '-', '...', '-', '...', '#' carry no [a-z]
    assert(m("n_alpha_words") == 11L)
    // 'the' present (twice but distinct once); none of the other
    // required stopwords appear
    assert(m("n_stop_found") == 1L)
  }

  test("gopherStats rules: a clean long prose doc keeps, a short one fails word count") {
    val long = (1 to 30).map(_ => "the data and more of it with that to be").mkString("\n")
    val rLong = statsOf(long)
    assert(rLong.getAs[Boolean]("keep"))
    val rShort = statsOf("the data and more of it with that to be")
    assert(!rShort.getAs[Boolean]("keep"))
    assert(rShort.getAs[Long]("n_rules_failed") == 1L)
  }

  test("gopherStats flags bullet-heavy and symbol-heavy docs") {
    val bullets = (1 to 60).map(i => s"- item the of number $i").mkString("\n")
    val rb = statsOf(bullets)
    assert(!rb.getAs[Boolean]("keep")) // 100% bullet lines >= 90%
    val symbols = ((1 to 50).map(_ => "the word") ++ (1 to 20).map(_ => "# #")).mkString(" ") + " of"
    val rs = statsOf(symbols)
    assert(rs.getAs[Long]("n_symbols") == 40L)
    assert(!rs.getAs[Boolean]("keep")) // 40 symbols vs 141 words > 10%
  }

  test("repetitionStats: hand-computed top-gram and dup-gram shares") {
    // "a b a b a b" (11 chars): top bigram 'a b' count 3, len 3 -> 9/11
    val df = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val r = ContentFilter.repetitionStats(df, "doc_id", "text").collect()(0)
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    assert(m("top2_mb") == (1000L * 9) / 11)      // 818
    // trigrams: 'a b a' x2, 'b a b' x2 -> top = 2*5 = 10 -> 909
    assert(m("top3_mb") == (1000L * 10) / 11)
    // 5-grams: 'a b a b a' and 'b a b a b' each once -> no dup
    assert(m("dup5_mb") == 0L)
    assert(m("keep") == false)                    // top2 818 >= 200
  }

  test("repetitionStats keeps a no-repeat doc and drops sub-2-word docs") {
    // 40 distinct words so even the longest single n-gram's char share
    // stays under the top-gram thresholds
    val df = Seq((1L, (1 to 40).map(i => f"w$i%02d").mkString(" ")), (2L, "solo"))
      .toDF("doc_id", "text")
    val out = ContentFilter.repetitionStats(df, "doc_id", "text").collect()
    assert(out.length == 1)                        // <2-word doc emits no grams
    assert(out(0).getAs[Long]("id") == 1L)
    assert(out(0).getAs[Boolean]("keep"))
  }

  test("blocklistScore counts words, phrases, and adjacent matches exactly") {
    val df = Seq(
      (1L, "slow slow slow merge here"),          // 'slow' x3, 'slow merge' x1
      (2L, "customer data and customer data"),    // phrase x2
      (3L, "clean text entirely")
    ).toDF("doc_id", "text")
    val out = ContentFilter.blocklistScore(df, "doc_id", "text",
      Seq("slow" -> 1L, "slow merge" -> 4L, "customer data" -> 8L), threshold = 7L)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Long]("score"), r.getAs[Boolean]("blocked"))).toMap
    assert(out(1L) == ((4L, 7L, true)))           // 3*1 + 1*4
    assert(out(2L) == ((2L, 16L, true)))
    assert(out(3L) == ((0L, 0L, false)))
  }

  test("blocklistScore is repartition-invariant") {
    val docs = graft.Tables.documents(spark, sf001)
    val a = ContentFilter.blocklistScore(docs, "doc_id", "text",
      Seq("slow" -> 1L, "dup" -> 2L), threshold = 3L)
    val b = ContentFilter.blocklistScore(docs.repartition(7), "doc_id", "text",
      Seq("slow" -> 1L, "dup" -> 2L), threshold = 3L)
    assert(a.orderBy("id").collect().toSeq == b.orderBy("id").collect().toSeq)
  }
}
