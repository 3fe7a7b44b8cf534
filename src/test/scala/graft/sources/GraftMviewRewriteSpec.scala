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
