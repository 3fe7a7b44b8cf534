package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Stats lifecycle policy (round 14): `analyze_after_commits => N` —
  * persisted via CREATE TBLPROPERTIES or ALTER TABLE SET
  * TBLPROPERTIES — re-runs the last ANALYZE automatically once a data
  * commit leaves the stats N versions behind, so CBO estimates track
  * continuous ingest with no operator in the loop. show_stats
  * surfaces the drift as a warning tier (fresh / drifting / stale).
  */
class GraftStatsPolicySpec extends SparkSpec {

  private def freshCatalog(): String = {
    val root = Files.createTempDirectory("graft_sp").toString
    val cat = s"gsp_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  private def withCbo[T](thr: Long)(body: => T): T = {
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    val prevThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr.toString)
    try body finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
    }
  }

  test("the policy re-analyzes after N commits: a table that grew 1000x " +
    "stops broadcasting WITHOUT any manual ANALYZE") {
    val cat = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.f (id BIGINT, v BIGINT)
      TBLPROPERTIES ('keys'='id', 'analyze_after_commits'='3')""")
    spark.sql(s"""CREATE TABLE $cat.db.d (id BIGINT, w BIGINT)
      TBLPROPERTIES ('keys'='id')""")
    spark.sql(s"INSERT INTO $cat.db.d SELECT id, id FROM range(50000)")
    spark.sql(s"CALL $cat.system.analyze('db.d')")
    spark.sql(s"INSERT INTO $cat.db.f SELECT id, id FROM range(100)")
    // the ONE manual analyze — the policy replays it from here on
    spark.sql(s"CALL $cat.system.analyze('db.f')")
    val q = s"""SELECT f.id, d.w FROM $cat.db.f f
      JOIN $cat.db.d d ON f.id = d.id"""
    def isBroadcast: Boolean = spark.sql(q).queryExecution.executedPlan
      .toString.contains("BroadcastHashJoin")
    withCbo(64 * 1024) {
      assert(isBroadcast, "100 analyzed rows must broadcast")
      // three growth commits: the third crosses the drift bar and
      // auto-re-analyzes — NO manual ANALYZE below this line
      spark.sql(s"INSERT INTO $cat.db.f SELECT id, id FROM range(100, 40000)")
      spark.sql(s"INSERT INTO $cat.db.f SELECT id, id FROM range(40000, 80000)")
      spark.sql(s"INSERT INTO $cat.db.f SELECT id, id FROM range(80000, 120000)")
      assert(!isBroadcast,
        "the policy must have refreshed the stats: 120k rows may not " +
          "plan as broadcast off 100-row stale stats")
      val shown = spark.sql(s"CALL $cat.system.show_stats('db.f')")
        .collect()
      assert(shown.forall(_.getString(12) == "fresh"),
        shown.map(_.toSeq.mkString("|")).mkString("\n"))
    }
  }

  test("no policy -> stale stats keep the wrong plan and show_stats " +
    "warns 'stale'; drift below the bar reads 'drifting'") {
    val cat = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.f (id BIGINT, v BIGINT)
      TBLPROPERTIES ('keys'='id')""")
    spark.sql(s"""CREATE TABLE $cat.db.d (id BIGINT, w BIGINT)
      TBLPROPERTIES ('keys'='id')""")
    spark.sql(s"INSERT INTO $cat.db.d SELECT id, id FROM range(50000)")
    spark.sql(s"CALL $cat.system.analyze('db.d')")
    spark.sql(s"INSERT INTO $cat.db.f SELECT id, id FROM range(100)")
    spark.sql(s"CALL $cat.system.analyze('db.f')")
    val q = s"""SELECT f.id, d.w FROM $cat.db.f f
      JOIN $cat.db.d d ON f.id = d.id"""
    withCbo(64 * 1024) {
      spark.sql(s"INSERT INTO $cat.db.f SELECT id, id FROM range(100, 120000)")
      // the stale-stats disaster the policy exists to prevent:
      assert(spark.sql(q).queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "without the policy, 120k rows still plan broadcast off stale stats")
      assert(spark.sql(s"CALL $cat.system.show_stats('db.f')")
        .collect().forall(_.getString(12) == "stale"))
    }
    // with a policy bar HIGHER than the drift: tier 'drifting'
    spark.sql(s"""ALTER TABLE $cat.db.f
      SET TBLPROPERTIES ('analyze_after_commits' = '50')""")
    assert(spark.sql(s"CALL $cat.system.show_stats('db.f')")
      .collect().forall(_.getString(12) == "drifting"))
  }

  test("SET/UNSET TBLPROPERTIES round-trip through DESCRIBE; config " +
    "keys and bad policy values reject") {
    val cat = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.t (id BIGINT, v BIGINT)
      TBLPROPERTIES ('keys'='id', 'team' = 'etl')""")
    spark.sql(s"ALTER TABLE $cat.db.t SET TBLPROPERTIES ('tier' = 'gold')")
    def props: Map[String, String] =
      spark.sql(s"SHOW TBLPROPERTIES $cat.db.t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("team").contains("etl") &&
      props.get("tier").contains("gold"), props.toString)
    spark.sql(s"ALTER TABLE $cat.db.t UNSET TBLPROPERTIES ('tier')")
    assert(!props.contains("tier"))
    // config keys are immutable
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.db.t SET TBLPROPERTIES ('keys' = 'v')")
    }
    assert(e1.getMessage.contains("CONFIG"), e1.getMessage)
    // a bad policy value rejects at DDL time, not at the Nth commit
    val e2 = intercept[Exception] {
      spark.sql(s"""ALTER TABLE $cat.db.t
        SET TBLPROPERTIES ('analyze_after_commits' = 'soon')""")
    }
    assert(e2.getMessage.contains("positive integer"), e2.getMessage)
  }
}
