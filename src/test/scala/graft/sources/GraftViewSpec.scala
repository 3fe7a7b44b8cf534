package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Persistent V2 views (round 12): [[GraftCatalog]] implements Spark
  * 4's native `ViewCatalog`; reads resolve through
  * [[graft.ext.GraftResolveViews]] (vanilla 4.1 ships the protocol
  * with no SQL wiring — the Iceberg-extensions model); DDL rides the
  * `CALL <cat>.system.create_view/drop_view/show_views` procedures,
  * since vanilla Spark routes `CREATE VIEW` to the session catalog
  * only.
  */
class GraftViewSpec extends SparkSpec {

  private def freshCatalog(): (String, String) = {
    val root = Files.createTempDirectory("graft_view").toString
    val cat = s"gview_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def seed(cat: String): Unit = {
    spark.sql(s"""CREATE TABLE $cat.db.t (k BIGINT, v BIGINT, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k', 'statsCols'='v')""")
    spark.sql(s"""INSERT INTO $cat.db.t (k, v, pk) VALUES
      (1, 10, 0), (2, 20, 1), (3, 60, 0), (4, 80, 1)""")
  }

  test("create/read/replace/drop lifecycle; view-over-view; SELECT " +
    "pushes the user's filter AND the view's filter into the scan") {
    val (cat, _) = freshCatalog()
    seed(cat)
    spark.sql(s"""CALL $cat.system.create_view('db.big',
      'SELECT k, v FROM $cat.db.t WHERE v > 15')""")
    assert(spark.sql(s"SELECT k FROM $cat.db.big ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
    // pushdown: both the view predicate and the outer one reach the
    // parquet scan as data filters (the view is INLINED, not a wall)
    val plan = spark.sql(s"SELECT k FROM $cat.db.big WHERE k = 2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("(v") && plan.contains("> 15)") &&
      plan.contains("(k") && plan.contains("= 2)") &&
      plan.contains("GraftScan"),
      s"expected both filters in the scan, got:\n$plan")
    // view over view expands recursively
    spark.sql(s"""CALL $cat.system.create_view('db.bigger',
      'SELECT k FROM $cat.db.big WHERE k >= 3')""")
    assert(spark.sql(s"SELECT * FROM $cat.db.bigger").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
    // CREATE without replace rejects an existing view; replace lands
    intercept[Throwable] {
      spark.sql(s"""CALL $cat.system.create_view('db.big',
        'SELECT k FROM $cat.db.t')""")
    }
    spark.sql(s"""CALL $cat.system.create_view('db.big',
      'SELECT k, v FROM $cat.db.t WHERE v > 50', replace => true)""")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.big").collect()(0)
      .getLong(0) == 2L)
    // listing + drop
    val views = spark.sql(s"CALL $cat.system.show_views('db')").collect()
      .map(_.getString(1)).toSet
    assert(views == Set("big", "bigger"))
    assert(spark.sql(s"CALL $cat.system.drop_view('db.bigger')")
      .collect()(0).getBoolean(1))
    intercept[Throwable] { spark.sql(s"SELECT * FROM $cat.db.bigger").collect() }
  }

  test("composition with column mapping: a view over the RENAMED name " +
    "reads old files through the map; a view written against the OLD " +
    "name fails loudly after the rename (no silent stale reads)") {
    val (cat, _) = freshCatalog()
    seed(cat)
    spark.sql(s"""CALL $cat.system.create_view('db.old',
      'SELECT k, v FROM $cat.db.t')""")
    spark.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN v TO cents")
    // the view over the renamed-away name must fail, not serve stale
    intercept[Throwable] { spark.sql(s"SELECT * FROM $cat.db.old").collect() }
    spark.sql(s"""CALL $cat.system.create_view('db.renamed',
      'SELECT k, cents FROM $cat.db.t WHERE cents > 15')""")
    val rows = spark.sql(s"SELECT k, cents FROM $cat.db.renamed ORDER BY k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(rows == Seq(2L -> 20L, 3L -> 60L, 4L -> 80L),
      "the view must read pre-rename files through the column map")
  }

  test("a view with UNQUALIFIED inner names resolves in its OWN stored " +
    "catalog+namespace context from any session context; its own CTE " +
    "names stay untouched") {
    val (cat, _) = freshCatalog()
    seed(cat)
    val prevCat = spark.catalog.currentCatalog()
    val prevDb = spark.catalog.currentDatabase
    try {
      spark.sql(s"USE $cat.db")
      // unqualified `t` + a CTE the view defines itself: the CTE name
      // must NOT be qualified away, the table name must pin to $cat.db
      spark.sql(s"""CALL $cat.system.create_view('db.ctx',
        'WITH capped AS (SELECT k, v FROM t WHERE v < 70)
         SELECT k FROM capped WHERE k >= 2')""")
    } finally spark.sql(s"USE $prevCat.$prevDb")
    // read from a DIFFERENT session context (the default catalog)
    assert(spark.catalog.currentCatalog() != cat)
    assert(spark.sql(s"SELECT * FROM $cat.db.ctx ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(2L, 3L),
      "the view's unqualified names must resolve in ITS context, not " +
        "the reader's")
  }

  test("guards: a view cannot shadow a table; namespaces holding only " +
    "a view store still cascade-drop; broken SQL rejects at CREATE") {
    val (cat, root) = freshCatalog()
    seed(cat)
    intercept[Throwable] {
      spark.sql(s"""CALL $cat.system.create_view('db.t',
        'SELECT 1 AS one')""")
    }
    intercept[Throwable] {
      spark.sql(s"""CALL $cat.system.create_view('db.broken',
        'SELECT nope FROM $cat.db.t')""")
    }
    assert(!Files.exists(java.nio.file.Paths.get(
      s"$root/db/_graft_views/broken.view")),
      "a rejected CREATE must persist nothing")
  }
}
