package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** Proof of SCALE.md's fact-fact join claim: two tables bucketed on the
  * join key join WITHOUT any shuffle exchange — the co-location is done
  * once at write time and every subsequent join on the key is
  * exchange-free, which is the difference between an O(data) shuffle per
  * query and none at 100 TB.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("equi-join of two tables bucketed on the key plans no Exchange") {
    val dir = Files.createTempDirectory("graft_buckets")
    val orders = graft.Tables.orders(spark, sf001).select("o_orderkey", "o_totalprice")
    val lineitem = graft.Tables.lineitem(spark, sf001).select("l_orderkey", "l_quantity")
    GraftTable.writeBucketed(orders, "graft_orders_b", s"$dir/orders", 8, Seq("o_orderkey"))
    GraftTable.writeBucketed(lineitem, "graft_lineitem_b", s"$dir/lineitem", 8, Seq("l_orderkey"))
    // disable broadcast so the plan must choose the bucketed sort-merge
    // path (a broadcast would also be shuffle-free, but then the test
    // would not be exercising bucketing)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("graft_orders_b")
        .join(spark.table("graft_lineitem_b"), $"o_orderkey" === $"l_orderkey")
        .groupBy("o_orderkey").count()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join + same-key aggregation must be exchange-free:\n$plan")
      // and it still computes the right thing
      val viaBuckets = j.count()
      val direct = orders.join(lineitem, $"o_orderkey" === $"l_orderkey")
        .groupBy("o_orderkey").count().count()
      assert(viaBuckets == direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    }
  }

  test("SCD-2 build over a table bucketed on the key plans no Exchange") {
    val dir = Files.createTempDirectory("graft_buckets_scd2")
    val updates = graft.Tables.orders(spark, sf001)
      .select("o_custkey", "o_orderdate", "o_totalprice", "o_orderkey")
    GraftTable.writeBucketed(updates, "graft_updates_b", s"$dir/updates", 8, Seq("o_custkey"))
    try {
      // bucket(o_custkey) satisfies BOTH the (key, time) dedup
      // aggregate's clustering AND the lead() window's partitioning —
      // the whole type-2 history build runs exchange-free off the
      // bucketed layout, the shape that matters when the update stream
      // is fact-sized
      val scd2 = Relational.scd2Intervals(spark.table("graft_updates_b"),
        "o_custkey", "o_orderdate", "o_totalprice", "o_orderkey")
      val plan = scd2.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed SCD-2 build must be exchange-free:\n$plan")
      // and it computes the same intervals as the unbucketed path
      val viaBuckets = scd2.count()
      val direct = Relational.scd2Intervals(updates,
        "o_custkey", "o_orderdate", "o_totalprice", "o_orderkey").count()
      assert(viaBuckets == direct)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_updates_b")
    }
  }
}
