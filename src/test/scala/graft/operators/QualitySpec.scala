package graft.operators

import graft.SparkSpec

class QualitySpec extends SparkSpec {

  test("validate reports exact violation counts per check") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(1L), 10.0, "F"),
      (Some(1L), 20.0, "O"),   // duplicate key
      (None, 30.0, "F"),       // null key
      (Some(2L), -5.0, "X")    // out of range + bad status
    ).toDF("k", "v", "st")
    val dim = Seq(1L).toDF("dk")
    val out = Quality.validate(df, Seq(
      Quality.NotNull("k"),
      Quality.Unique(Seq("k")),
      Quality.InRange("v", 0.0, 100.0),
      Quality.InSet("st", Seq("F", "O")),
      Quality.RefIntegrity("k", dim, "dk", "dim")))
      .as[(String, Long, Boolean)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out("not_null(k)") === ((1L, false)))
    // 4 rows, 3 distinct key values (1, null, 2) → 1 duplicate beyond first
    assert(out("unique(k)") === ((1L, false)))
    assert(out("in_range(v,0.0,100.0)") === ((1L, false)))
    assert(out("in_set(st)") === ((1L, false)))
    assert(out("ref(k->dim.dk)") === ((1L, false))) // key 2 missing from dim
  }

  test("a clean table passes every check") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 5.0, "F"), (2L, 6.0, "O")).toDF("k", "v", "st")
    val dim = Seq(1L, 2L).toDF("dk")
    val out = Quality.validate(df, Seq(
      Quality.NotNull("k"), Quality.Unique(Seq("k")),
      Quality.InRange("v", 0.0, 10.0), Quality.InSet("st", Seq("F", "O")),
      Quality.RefIntegrity("k", dim, "dk", "dim")))
      .as[(String, Long, Boolean)].collect()
    assert(out.forall(r => r._2 == 0L && r._3), out.mkString(", "))
  }

  test("empty check list is rejected") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException](
      Quality.validate(Seq((1L)).toDF("k"), Seq.empty))
  }
}
