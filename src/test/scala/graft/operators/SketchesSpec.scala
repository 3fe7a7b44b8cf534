package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {

  test("hllEstimate lands within ~5% of a 10k true cardinality at b=10") {
    val s = spark
    import s.implicits._
    val df = (1L to 10000L).toDF("id")
    val (mUsed, _, est) = Sketches.hllEstimate(Sketches.hllState(df, "id", 10), 10)
      .as[(Long, Long, Double)].collect().head
    assert(mUsed <= 1024L)
    assert(math.abs(est - 10000.0) / 10000.0 < 0.05, s"estimate $est")
  }

  test("hllMerge of disjoint slices equals the state of the union") {
    val s = spark
    import s.implicits._
    val a = (1L to 4000L).toDF("id")
    val b = (3000L to 8000L).toDF("id") // overlapping on purpose
    val merged = Sketches.hllMerge(Seq(
      Sketches.hllState(a, "id", 8), Sketches.hllState(b, "id", 8)))
      .as[(Long, Int)].collect().sorted
    val direct = Sketches.hllState(a.unionByName(b), "id", 8)
      .as[(Long, Int)].collect().sorted
    assert(merged.toSeq === direct.toSeq)
  }

  test("hll state is bounded by m rows and insensitive to duplicates") {
    val s = spark
    import s.implicits._
    val once = Sketches.hllState((1L to 500L).toDF("id"), "id", 6)
    val tripled = Sketches.hllState(
      ((1L to 500L) ++ (1L to 500L) ++ (1L to 500L)).toDF("id"), "id", 6)
    assert(once.count() <= 64L)
    assert(once.as[(Long, Int)].collect().sorted.toSeq ===
      tripled.as[(Long, Int)].collect().sorted.toSeq)
  }

  test("cms estimates are admissible upper bounds and exact without collisions") {
    val s = spark
    import s.implicits._
    // 50 keys with frequency = key, w=1024 → essentially collision-free
    val rows = (1L to 50L).flatMap(k => Seq.fill(k.toInt)(k)).toDF("k")
    val st = Sketches.cmsState(rows, "k", d = 4, w = 1024)
    val est = Sketches.cmsLookup(st, (1L to 50L).toDF("k"), "k", 4, 1024)
      .as[(Long, Long)].collect().toMap
    (1L to 50L).foreach(k => assert(est(k) === k, s"key $k"))
  }

  test("cms never underestimates under forced collisions") {
    val s = spark
    import s.implicits._
    val rows = (1L to 200L).flatMap(k => Seq.fill(3)(k)).toDF("k")
    val st = Sketches.cmsState(rows, "k", d = 2, w = 16) // heavy collisions
    val est = Sketches.cmsLookup(st, (1L to 200L).toDF("k"), "k", 2, 16)
      .as[(Long, Long)].collect().toMap
    (1L to 200L).foreach(k => assert(est(k) >= 3L, s"key $k underestimated"))
  }

  test("cms state is bounded by d·w cells") {
    val s = spark
    import s.implicits._
    val st = Sketches.cmsState((1L to 5000L).toDF("k"), "k", d = 3, w = 32)
    assert(st.count() <= 96L)
    // cell-wise totals: each of the d rows sees every input once
    val perRow = st.groupBy("r").agg(sum("cnt").as("n"))
      .as[(Int, Long)].collect().toMap
    assert(perRow.values.toSet === Set(5000L))
  }
}
