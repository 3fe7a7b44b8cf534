package graft.operators

import graft.SparkSpec

class OutliersSpec extends SparkSpec {

  test("madOutliers flags exactly the rows with |x − med| > k·MAD, per group") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // group a: med = 0, MAD = 0 → any nonzero deviation is an outlier
      ("a", 1L, 0.0), ("a", 2L, 0.0), ("a", 3L, 0.0), ("a", 4L, 0.0), ("a", 5L, 100.0),
      // group b: med = 3, devs {0,1,1,2,2} → MAD = 1; k=2 → need dev > 2: none
      ("b", 6L, 1.0), ("b", 7L, 2.0), ("b", 8L, 3.0), ("b", 9L, 4.0), ("b", 10L, 5.0)
    ).toDF("g", "id", "v")
    val out = Outliers.madOutliers(df, Seq("g"), "v", "id", k = 2.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq === Seq(("a", 5L, 100.0, 0.0, 0.0, 100.0)))
  }

  test("lower-median rank semantics: even group size takes element (n-1)/2") {
    val s = spark
    import s.implicits._
    // n = 4 → 0-based rank 1 → value 2; devs {1,0,1,7} sorted {0,1,1,7}
    // → MAD = rank-1 element = 1; k=3 → dev > 3 flags only the 9
    val df = Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 3.0), ("g", 4L, 9.0))
      .toDF("g", "id", "v")
    val out = Outliers.madOutliers(df, Seq("g"), "v", "id", k = 3.0)
      .collect().map(r => (r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq === Seq((4L, 2.0, 1.0)))
  }

  test("non-positive k is rejected") {
    val s = spark
    import s.implicits._
    val df = Seq(("g", 1L, 1.0)).toDF("g", "id", "v")
    intercept[IllegalArgumentException](
      Outliers.madOutliers(df, Seq("g"), "v", "id", k = 0.0))
  }
}
