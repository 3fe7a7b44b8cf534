package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Transparent materialized-view rewrite (round 14,
  * [[graft.ext.GraftMviewRewrite]]): an aggregate exactly matching a
  * registered FULLY-FRESH mview reads the view's state table instead
  * of the base; any staleness, shape mismatch, time-travel pin, or
  * approximate family leaves the plan untouched.
  */
class GraftMviewRewriteSpec extends SparkSpec {

  private def freshCatalog(): String = {
    val root = Files.createTempDirectory("graft_mvr").toString
    val cat = s"mvr_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  private def seed(cat: String): Unit = {
    spark.sql(s"""CREATE TABLE $cat.db.ev (id BIGINT, user_id BIGINT,
        cents BIGINT) TBLPROPERTIES ('keys'='id')""")
    spark.sql(s"INSERT INTO $cat.db.ev SELECT id, id % 7, id * 3 FROM range(200)")
    spark.sql(s"""CALL $cat.system.create_mview('db.spend',
      base => 'db.ev', keys => 'user_id',
      measures => 'cents, min:cents, max:cents')""")
  }

  private def agg(cat: String) = spark.sql(
    s"""SELECT user_id, sum(cents) AS s, count(*) AS n, avg(cents) AS a,
       min(cents) AS lo, max(cents) AS hi, count(cents) AS nc
     FROM $cat.db.ev GROUP BY user_id""")

  private def readsState(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("spend_state")

  private def expected(cat: String): Map[Long, (Long, Long, Double, Long, Long, Long)] = {
    val prev = spark.conf.get("spark.graft.mview.rewrite", "true")
    spark.conf.set("spark.graft.mview.rewrite", "false")
    try agg(cat).collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))).toMap
    finally spark.conf.set("spark.graft.mview.rewrite", prev)
  }

  test("a fresh mview transparently answers the exact aggregate; " +
    "results identical to the direct plan") {
    val cat = freshCatalog()
    seed(cat)
    val want = expected(cat)
    val df = agg(cat)
    assert(readsState(df), df.queryExecution.optimizedPlan.toString)
    val got = df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))).toMap
    assert(got == want)
  }

  test("STALENESS gates the rewrite: a base write without refresh " +
    "reverts to the direct plan; refresh re-arms it") {
    val cat = freshCatalog()
    seed(cat)
    assert(readsState(agg(cat)))
    spark.sql(s"INSERT INTO $cat.db.ev SELECT id, id % 7, id FROM range(200, 230)")
    val stale = agg(cat)
    assert(!readsState(stale),
      "a STALE mview must never answer transparently")
    assert(stale.collect().map(_.getLong(1)).sum == expected(cat).values.map(_._1).sum)
    spark.sql(s"CALL $cat.system.refresh_mview('db.spend')")
    val fresh = agg(cat)
    assert(readsState(fresh))
    assert(fresh.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))).toMap == expected(cat))
  }

  test("shape mismatches never rewrite: WHERE below the aggregate, " +
    "different keys, DISTINCT, unregistered measures, time travel") {
    val cat = freshCatalog()
    seed(cat)
    assert(readsState(agg(cat))) // control: the happy path fires
    assert(!readsState(spark.sql(
      s"""SELECT user_id, sum(cents) AS s FROM $cat.db.ev
        WHERE cents > 10 GROUP BY user_id""")))
    assert(!readsState(spark.sql(
      s"SELECT id, sum(cents) AS s FROM $cat.db.ev GROUP BY id")))
    assert(!readsState(spark.sql(
      s"""SELECT user_id, count(DISTINCT cents) AS d FROM $cat.db.ev
        GROUP BY user_id""")))
    assert(!readsState(spark.sql(
      s"SELECT user_id, sum(id) AS s FROM $cat.db.ev GROUP BY user_id")))
    assert(!readsState(spark.sql(
      s"""SELECT user_id, sum(cents) AS s
        FROM $cat.db.ev VERSION AS OF 1 GROUP BY user_id""")))
    // conf kill switch
    spark.conf.set("spark.graft.mview.rewrite", "false")
    try assert(!readsState(agg(cat)))
    finally spark.conf.set("spark.graft.mview.rewrite", "true")
  }

  test("WHERE matching (round-14 extension): an identical WHERE matches " +
    "the view's stored filter; a group-key-only WHERE commutes; " +
    "anything else never rewrites") {
    val cat = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.ev (id BIGINT, user_id BIGINT,
        cents BIGINT) TBLPROPERTIES ('keys'='id')""")
    spark.sql(s"INSERT INTO $cat.db.ev SELECT id, id % 7, id * 3 FROM range(200)")
    // a FILTERED view (SQL flavor persists the WHERE + a FILTER measure)
    spark.sql(s"""CALL $cat.system.create_mview_sql('db.spend', sql =>
      "SELECT user_id, sum(cents) AS s, count(*) AS n,
         sum(cents) FILTER (WHERE cents % 2 = 0) AS evens
       FROM $cat.db.ev WHERE cents > 30 GROUP BY user_id")""")
    def run(sql: String) = spark.sql(sql)
    val matching = run(s"""SELECT user_id, sum(cents) AS s,
        sum(cents) FILTER (WHERE cents % 2 = 0) AS evens
      FROM $cat.db.ev WHERE cents > 30 GROUP BY user_id""")
    assert(readsState(matching),
      matching.queryExecution.optimizedPlan.toString)
    val want = {
      spark.conf.set("spark.graft.mview.rewrite", "false")
      try run(s"""SELECT user_id, sum(cents) AS s,
          sum(cents) FILTER (WHERE cents % 2 = 0) AS evens
        FROM $cat.db.ev WHERE cents > 30 GROUP BY user_id""").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      finally spark.conf.set("spark.graft.mview.rewrite", "true")
    }
    assert(matching.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == want)
    // a DIFFERENT WHERE must not match the filtered view
    assert(!readsState(run(s"""SELECT user_id, sum(cents) AS s
      FROM $cat.db.ev WHERE cents > 31 GROUP BY user_id""")))
    // …nor may the filtered view answer the UNFILTERED aggregate
    assert(!readsState(run(s"""SELECT user_id, sum(cents) AS s
      FROM $cat.db.ev GROUP BY user_id""")))
    // a mismatched aggregate FILTER must not match the filtered measure
    assert(!readsState(run(s"""SELECT user_id,
        sum(cents) FILTER (WHERE cents % 3 = 0) AS thirds
      FROM $cat.db.ev WHERE cents > 30 GROUP BY user_id""")))

    // an UNFILTERED view + a GROUP-KEY-ONLY WHERE: commutes through
    // the aggregation and applies to the state read
    spark.sql(s"""CALL $cat.system.create_mview('db.all',
      base => 'db.ev', keys => 'user_id', measures => 'cents')""")
    val keyed = run(s"""SELECT user_id, sum(cents) AS s, count(*) AS n
      FROM $cat.db.ev WHERE user_id >= 3 GROUP BY user_id""")
    assert(keyed.queryExecution.optimizedPlan.toString.contains("all_state"),
      keyed.queryExecution.optimizedPlan.toString)
    val wantK = {
      spark.conf.set("spark.graft.mview.rewrite", "false")
      try run(s"""SELECT user_id, sum(cents) AS s, count(*) AS n
        FROM $cat.db.ev WHERE user_id >= 3 GROUP BY user_id""").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      finally spark.conf.set("spark.graft.mview.rewrite", "true")
    }
    assert(keyed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == wantK)
    // a NON-key WHERE on the unfiltered view never rewrites
    assert(!run(s"""SELECT user_id, sum(cents) AS s
      FROM $cat.db.ev WHERE cents > 100 GROUP BY user_id""")
      .queryExecution.optimizedPlan.toString.contains("all_state"))
  }

  test("derived-key mviews rewrite: GROUP BY CAST(ts AS DATE) matches " +
    "the daily rollup's derived key by canonical rendering") {
    val cat = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.ev (id BIGINT, ts TIMESTAMP,
        user_id BIGINT, cents BIGINT) TBLPROPERTIES ('keys'='id')""")
    spark.sql(s"""INSERT INTO $cat.db.ev
      SELECT id, timestamp_seconds(1700000000 + id * 40000), id % 3, id
      FROM range(120)""")
    spark.sql(s"""CALL $cat.system.create_mview_sql('db.daily', sql =>
      "SELECT CAST(ts AS DATE) AS day, user_id, sum(cents) AS total,
         count(*) AS n
       FROM $cat.db.ev GROUP BY CAST(ts AS DATE), user_id")""")
    val q = s"""SELECT CAST(ts AS DATE) AS d, user_id,
        sum(cents) AS s, count(*) AS n
      FROM $cat.db.ev GROUP BY CAST(ts AS DATE), user_id"""
    val df = spark.sql(q)
    assert(df.queryExecution.optimizedPlan.toString.contains("daily_state"),
      df.queryExecution.optimizedPlan.toString)
    val want = {
      spark.conf.set("spark.graft.mview.rewrite", "false")
      try spark.sql(q).collect()
        .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      finally spark.conf.set("spark.graft.mview.rewrite", "true")
    }
    assert(df.collect().map(r => (r.getDate(0).toString, r.getLong(1),
      r.getLong(2), r.getLong(3))).toSet == want)
    // a DIFFERENT derivation must not match
    assert(!spark.sql(s"""SELECT CAST(ts AS STRING) AS d, user_id,
        sum(cents) AS s FROM $cat.db.ev
      GROUP BY CAST(ts AS STRING), user_id""")
      .queryExecution.optimizedPlan.toString.contains("daily_state"))
  }

  test("HAVING and projections above the aggregate survive the swap") {
    val cat = freshCatalog()
    seed(cat)
    val df = spark.sql(
      s"""SELECT user_id, sum(cents) AS s FROM $cat.db.ev
        GROUP BY user_id HAVING count(*) > 28""")
    assert(readsState(df), df.queryExecution.optimizedPlan.toString)
    val want = {
      spark.conf.set("spark.graft.mview.rewrite", "false")
      try spark.sql(s"""SELECT user_id, sum(cents) AS s FROM $cat.db.ev
          GROUP BY user_id HAVING count(*) > 28""").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.set("spark.graft.mview.rewrite", "true")
    }
    assert(df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == want)
  }
}
