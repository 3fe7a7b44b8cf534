package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NfcNormalizeSpec extends SparkSpec {

  test("composes decomposed sequences; identity on ASCII; null-safe") {
    val s = spark
    import s.implicits._
    val df = Seq(
      Some("café"),        // e + combining acute → é
      Some("plän"),        // a + combining diaeresis → ä
      Some("plain ascii"),
      None
    ).toDF("t")
    val out = df.select(NfcNormalize.nfcCol(col("t"))).as[Option[String]].collect()
    assert(out(0) === Some("café"))
    assert(out(1) === Some("plän"))
    assert(out(2) === Some("plain ascii"))
    assert(out(3) === None)
  }

  test("normalized length shrinks by the number of composed pairs") {
    val s = spark
    import s.implicits._
    val df = Seq("x café plän").toDF("t")
    val (raw, nfc) = df.select(length(col("t")), length(NfcNormalize.nfcCol(col("t"))))
      .as[(Int, Int)].collect().head
    // "x cafe◌́ pla◌̈n" = 13 code points; both marks compose → 11
    assert(raw === 13 && nfc === 11)
  }

  test("graft_nfc registers for SQL callers") {
    NfcNormalize.register(spark)
    val got = spark.sql("SELECT graft_nfc('café') AS n")
      .collect().head.getString(0)
    assert(got === "café")
  }
}
