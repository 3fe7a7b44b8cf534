package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** STORAGE-PARTITIONED JOINS (round 11, SPARK-37375 re-expressed over
  * the graft manifest): catalog scans report KeyGroupedPartitioning
  * over the table's partition column and plan key-grouped input
  * partitions, so two tables partitioned on the same key JOIN WITHOUT
  * a shuffle exchange on either side, and a groupBy on the partition
  * key aggregates exchange-free. Results are plan-shape-independent:
  * every test cross-checks against the shuffled plan.
  */
class GraftSpjSpec extends SparkSpec {

  private def freshCatalog(): (String, String) = {
    val root = Files.createTempDirectory("graft_spj").toString
    val cat = s"gspj_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def mkFact(cat: String, name: String, rows: Int,
                     mod: Int = 4): Unit = {
    spark.sql(s"""CREATE TABLE $cat.db.$name (k BIGINT, v BIGINT, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k')""")
    spark.range(0, rows)
      .selectExpr("id AS k", "id * 10 AS v", s"id % $mod AS pk")
      .createOrReplaceTempView(s"spj_src_$name")
    spark.sql(s"INSERT INTO $cat.db.$name (k, v, pk) " +
      s"SELECT k, v, pk FROM spj_src_$name")
  }

  private def shufflesIn(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan.toString
    "Exchange hashpartitioning".r.findAllIn(plan).length
  }

  private def noBroadcast[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("fact-fact join on the shared partition key plans ZERO shuffle " +
    "exchanges; rows exactly match the shuffled plan") {
    val (cat, _) = freshCatalog()
    mkFact(cat, "a", 2000)
    mkFact(cat, "b", 2000)
    val q = s"""SELECT a.k, a.v, b.v AS v2 FROM $cat.db.a a
      JOIN $cat.db.b b ON a.pk = b.pk AND a.k = b.k"""
    noBroadcast {
      val df = spark.sql(q)
      val got = df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(shufflesIn(df) == 0, "storage-partitioned join must not shuffle")
      // cross-check against the engine's shuffled plan (flag off)
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      try {
        val ref = spark.sql(q)
        val want = ref.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(shufflesIn(ref) > 0, "the cross-check plan should shuffle")
        assert(got == want)
      } finally
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    }
  }

  test("one side missing a partition value stays exchange-free " +
    "(pushPartValues) and exact; groupBy on the partition key " +
    "aggregates without an exchange") {
    val (cat, _) = freshCatalog()
    mkFact(cat, "a", 1200, mod = 4)
    mkFact(cat, "b", 1200, mod = 3) // pk 3 never appears in b
    val q = s"""SELECT a.k, b.v AS v2 FROM $cat.db.a a
      JOIN $cat.db.b b ON a.pk = b.pk AND a.k = b.k"""
    noBroadcast {
      val df = spark.sql(q)
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(shufflesIn(df) == 0)
      // expected: k joins where id%4 == id%3 (ids 0..1199)
      val want = (0L until 1200L)
        .filter(i => i % 4 == i % 3).map(i => (i, i * 10)).toSet
      assert(got == want)
    }

    val agg = spark.sql(s"SELECT pk, sum(v) AS s FROM $cat.db.a GROUP BY pk")
    assert(shufflesIn(agg) == 0,
      "groupBy on the partition key must aggregate exchange-free")
    val got = agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (0L until 1200L).groupBy(_ % 4).view
      .mapValues(_.map(_ * 10).sum).toMap
    assert(got == want)
  }

  test("hidden bucket[n] tables join on the bucket SOURCE column with " +
    "zero shuffles (the catalog's bucket function resolves the " +
    "transform); mismatched bucket counts stay exact") {
    val (cat, _) = freshCatalog()
    Seq("ba", "bb").foreach { t =>
      spark.sql(s"""CREATE TABLE $cat.db.$t (k BIGINT, v BIGINT)
        PARTITIONED BY (bucket(8, k)) TBLPROPERTIES ('keys'='k')""")
      spark.range(0, 1500).selectExpr("id AS k", s"id * 3 AS v")
        .createOrReplaceTempView(s"spj_bsrc_$t")
      spark.sql(s"INSERT INTO $cat.db.$t (k, v) " +
        s"SELECT k, v FROM spj_bsrc_$t")
    }
    val q = s"""SELECT a.k, a.v, b.v AS v2 FROM $cat.db.ba a
      JOIN $cat.db.bb b ON a.k = b.k"""
    noBroadcast {
      val df = spark.sql(q)
      val got = df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(shufflesIn(df) == 0,
        "co-bucketed storage-partitioned join must not shuffle")
      assert(got == (0L until 1500L).map(i => (i, i * 3, i * 3)).toSet)
    }

    // the catalog function is BIT-IDENTICAL to the write-side
    // derivation (pmod(hash(col), n)) — the join test alone could not
    // catch a drifted definition (co-partitioned joins compare the two
    // sides' reported values, they never re-evaluate the function)
    val bound = org.apache.spark.sql.graft.GraftBucketFunction.bind(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("c",
          org.apache.spark.sql.types.LongType))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions
        .ScalarFunction[Integer]]
    val viaSql = spark.range(0, 200)
      .selectExpr("id", "pmod(hash(id), 8) AS b").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0L until 200L).foreach { k =>
      assert(bound.produceResult(
        org.apache.spark.sql.catalyst.InternalRow(8, k)).intValue
        == viaSql(k), s"bucket($k) drifted from the write derivation")
    }

    // a 4-bucket side cannot co-locate with an 8-bucket side — the
    // plan shuffles, the rows stay exact
    spark.sql(s"""CREATE TABLE $cat.db.b4 (k BIGINT, v BIGINT)
      PARTITIONED BY (bucket(4, k)) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"INSERT INTO $cat.db.b4 (k, v) SELECT k, v FROM spj_bsrc_ba")
    noBroadcast {
      val df = spark.sql(s"""SELECT a.k FROM $cat.db.ba a
        JOIN $cat.db.b4 b ON a.k = b.k""")
      assert(df.collect().length == 1500)
    }
  }

  test("graceful fallbacks: a deletion-vectored table and a pruned-out " +
    "partition column keep exact results (with a shuffle)") {
    val (cat, _) = freshCatalog()
    mkFact(cat, "a", 800)
    mkFact(cat, "b", 800)
    spark.sql(s"DELETE FROM $cat.db.b WHERE k = 7") // lands a vector
    noBroadcast {
      val q = s"""SELECT a.k FROM $cat.db.a a
        JOIN $cat.db.b b ON a.pk = b.pk AND a.k = b.k"""
      val df = spark.sql(q)
      val got = df.collect().map(_.getLong(0)).toSet
      assert(got == (0L until 800L).toSet - 7L)

      // join NOT on the partition key: pk pruned from b's output —
      // must not crash, plans a plain shuffled join, exact rows
      val q2 = s"""SELECT a.k FROM $cat.db.a a
        JOIN $cat.db.a b ON a.k = b.k"""
      assert(spark.sql(q2).collect().length == 800)
    }
  }
}
