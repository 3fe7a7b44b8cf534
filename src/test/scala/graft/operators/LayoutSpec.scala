package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  test("zValue interleaves bits (x even positions, y odd)") {
    val s = spark
    import s.implicits._
    val df = Seq((3L, 0L), (0L, 3L), (1L, 2L), (255L, 255L)).toDF("x", "y")
    val z = df.select(Layout.zValue(col("x"), col("y"), 8)).as[Long].collect()
    assert(z(0) === 5L)     // x bits 0,1 → z bits 0,2
    assert(z(1) === 10L)    // y bits 0,1 → z bits 1,3
    assert(z(2) === 1L + 8L) // x bit 0 → z bit 0; y bit 1 → z bit 3
    assert(z(3) === 65535L) // all 16 low bits set
  }

  test("zorderBy bounds BOTH dimension spans per partition; a 1-D sort does not") {
    val s = spark
    import s.implicits._
    // full 64×64 grid
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    def spans(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val rows = df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
        .agg(max("xs"), max("ys")).collect().head
      (rows.getLong(0), rows.getLong(1))
    }
    val z = Layout.zorderBy(grid.withColumn("z",
      Layout.zValue(col("x"), col("y"), 6)), col("z"), 16)
    val (zx, zy) = spans(z)
    // 16 partitions of a 12-bit z-space fix ~2 high bits of each dim:
    // ideal span 15; allow slack for range-boundary sampling
    assert(zx <= 31 && zy <= 31, s"z-order spans: x=$zx y=$zy")
    val linear = grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
    val (_, ly) = spans(linear)
    assert(ly >= 63, s"1-D layout should leave y unbounded, got $ly")
  }

  test("zValue rejects out-of-range bit widths") {
    intercept[IllegalArgumentException](Layout.zValue(lit(1L), lit(1L), 0))
    intercept[IllegalArgumentException](Layout.zValue(lit(1L), lit(1L), 32))
  }

  test("shardManifest: shards partition the corpus, stay balanced, and the " +
      "digest isolates a single-doc change to its shard") {
    val s = spark
    import s.implicits._
    val docs = graft.Tables.documents(spark, sf001).select("doc_id", "text")
    val m = Layout.shardManifest(docs, "doc_id", "text", 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(m.map(_._1) == (0L to 7L), "every shard present")
    assert(m.map(_._2).sum == docs.count(), "shards partition the corpus")
    val counts = m.map(_._2.toDouble)
    assert(counts.max / (counts.sum / 8) < 1.6,
      s"md5 assignment should be Poisson-balanced, got $counts")
    // mutate ONE doc's text: exactly one shard's digest flips, and only
    // its sum_chars moves
    val mutated = docs.withColumn("text",
      when(col("doc_id") === 7L, concat(col("text"), lit("!"))).otherwise(col("text")))
    val m2 = Layout.shardManifest(mutated, "doc_id", "text", 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val changed = m.zip(m2).filter { case (a, b) => a != b }
    assert(changed.size == 1, s"exactly one shard must change, got $changed")
    assert(changed.head._1._2 == changed.head._2._2, "doc count unchanged")
    assert(changed.head._2._3 == changed.head._1._3 + 1, "one extra char")
    // assignment and digest are partition-stable
    val m3 = Layout.shardManifest(docs.repartition(7), "doc_id", "text", 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(m3 == m)
  }
}
