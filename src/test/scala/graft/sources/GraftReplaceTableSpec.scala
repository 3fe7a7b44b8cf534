package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** CREATE OR REPLACE TABLE / REPLACE TABLE … AS SELECT over the graft
  * catalog — served by the engine's non-atomic fallback (drop +
  * create; the catalog is not a StagingTableCatalog). Documented
  * divergence from Delta: REPLACE starts a FRESH history (version
  * clock resets) — the old table's time travel does not carry across
  * a replace. A REPLACE of a missing table errors; CREATE OR REPLACE
  * creates it.
  */
class GraftReplaceTableSpec extends SparkSpec {

  private def freshCatalog(): (String, String) = {
    val root = Files.createTempDirectory("graft_rpl").toString
    val cat = s"grpl_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  test("CREATE OR REPLACE TABLE swaps schema and contents; the old " +
    "directory is gone and queries see the new shape") {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.t (k BIGINT, v BIGINT, day STRING)
      PARTITIONED BY (day) TBLPROPERTIES ('keys'='k', 'statsCols'='v')""")
    spark.sql(s"INSERT INTO $cat.db.t (k, v, day) VALUES (1, 10, 'd1')")
    spark.sql(s"""CREATE OR REPLACE TABLE $cat.db.t (k BIGINT, s STRING)
      TBLPROPERTIES ('keys'='k')""")
    assert(spark.sql(s"SELECT * FROM $cat.db.t").schema.fieldNames.toSeq
      == Seq("k", "s"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t")
      .collect()(0).getLong(0) == 0L)
    spark.sql(s"INSERT INTO $cat.db.t (k, s) VALUES (7, 'x')")
    assert(spark.sql(s"SELECT k, s FROM $cat.db.t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((7L, "x")))
    // fresh history: the replaced table's day=d1 files are gone
    assert(!Files.exists(java.nio.file.Paths.get(s"$root/db/t/day=d1")))
  }

  test("REPLACE TABLE AS SELECT lands the query's rows; REPLACE of a " +
    "missing table errors while CREATE OR REPLACE creates it") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.r (k BIGINT, v BIGINT)
      TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"INSERT INTO $cat.db.r (k, v) VALUES (1, 1)")
    spark.sql(s"""REPLACE TABLE $cat.db.r TBLPROPERTIES ('keys'='k')
      AS SELECT CAST(9 AS BIGINT) AS k, 'nine' AS name""")
    assert(spark.sql(s"SELECT k, name FROM $cat.db.r").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((9L, "nine")))

    intercept[Exception] {
      spark.sql(s"""REPLACE TABLE $cat.db.never TBLPROPERTIES ('keys'='k')
        AS SELECT CAST(1 AS BIGINT) AS k""")
    }
    spark.sql(s"""CREATE OR REPLACE TABLE $cat.db.fresh (k BIGINT)
      TBLPROPERTIES ('keys'='k')""")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.fresh")
      .collect()(0).getLong(0) == 0L)
  }
}
