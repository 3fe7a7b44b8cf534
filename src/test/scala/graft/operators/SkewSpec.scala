package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join result") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "payload") // key 1 is hot (10% of rows)
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .select("k", "payload", "name")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin left-outer keeps unmatched big-side rows exactly once") {
    val big = Seq((1L, "x"), (99L, "y")).toDF("k", "payload")
    val small = Seq((1L, "hot")).toDF("k", "name")
    val out = Skew.saltedJoin(big, small, "k", salts = 4, joinType = "left_outer")
    assert(out.count() == 2)
    assert(out.filter($"k" === 99L && $"name".isNull).count() == 1)
  }

  test("saltedCount matches plain groupBy count") {
    val df = (1 to 500).map(i => (if (i % 5 == 0) "hot" else s"k$i")).toDF("g")
    val got = Skew.saltedCount(df, col("g"), salts = 16)
      .as[(String, Long)].collect().toMap
    assert(got("hot") == 100)
    assert(got.values.sum == 500)
  }
}
