package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PiiSpec extends SparkSpec {

  private def scrub(text: String): (Int, Int, Int, Int, String) = {
    val s = spark
    import s.implicits._
    Pii.scrub(Seq((1L, text)).toDF("id", "t"), "t")
      .select(col("n_email"), col("n_card"), col("n_ip"), col("n_phone"), col("clean"))
      .as[(Int, Int, Int, Int, String)].collect().head
  }

  test("counts and redacts every category in order") {
    val got = scrub(
      "mail a.b+c@ex.co card 4111-1111 1111 2222 ip 10.0.0.255 tel +1 (555) 010-9999 end")
    assert(got === ((1, 1, 1, 1,
      "mail <EMAIL> card <CARD> ip <IP> tel <PHONE> end")))
  }

  test("placeholders never satisfy later patterns; clean text passes through") {
    val got = scrub("no pii here at all")
    assert(got === ((0, 0, 0, 0, "no pii here at all")))
    // an email whose local part is digits must not leave a phone match
    val g2 = scrub("x 12345678@ex.com y")
    assert(g2 === ((1, 0, 0, 0, "x <EMAIL> y")))
  }

  test("multiple matches per category all count") {
    val got = scrub("a@b.co c@d.org 1.2.3.4 5.6.7.8")
    assert(got._1 === 2)
    assert(got._3 === 2)
    assert(got._5 === "<EMAIL> <EMAIL> <IP> <IP>")
  }

  test("a 16-digit run is a card, shorter digit runs with separators are phones") {
    val got = scrub("4111111111111111 and 555-010-9999")
    assert((got._2, got._4) === ((1, 1)))
    assert(got._5 === "<CARD> and <PHONE>")
  }

  test("kAnonymize picks the smallest level satisfying k; exact classes") {
    val s = spark
    import s.implicits._
    // ages 10..13 + 20..23, one row each: exact level (gran 1) has
    // singletons; gran 10 groups them into two classes of 4
    val df = (Seq(10, 11, 12, 13, 20, 21, 22, 23)).map(a => Tuple1(a.toLong))
      .toDF("age")
    val out = Pii.kAnonymize(df, Seq("age" -> Seq(1L, 10L)), k = 4L)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 1L, 4L), (1L, 2L, 4L)),
      s"level 1, classes 1 and 2 with 4 rows each: $out")
  }

  test("kAnonymize suppresses residual violators at the fallback level; validates ladders") {
    val s = spark
    import s.implicits._
    // even at the coarsest level, value 990 is alone → suppressed;
    // k can NEVER be met at any level so the fallback (last) level is used
    val df = (Seq(1, 2, 3, 11, 12, 990)).map(a => Tuple1(a.toLong)).toDF("age")
    val out = Pii.kAnonymize(df, Seq("age" -> Seq(1L, 100L)), k = 5L)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 0L, 5L)),
      s"the five small ages survive at gran 100; 990 suppresses: $out")
    intercept[IllegalArgumentException] {
      Pii.kAnonymize(df, Seq("age" -> Seq(1L, 10L), "x" -> Seq(1L)), 2L)
    }
    intercept[IllegalArgumentException] {
      Pii.kAnonymize(df, Seq("age" -> Seq(0L)), 2L)
    }
  }
}
