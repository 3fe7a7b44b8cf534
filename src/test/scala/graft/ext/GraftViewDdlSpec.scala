package graft.ext

import java.nio.file.Files

import graft.SparkSpec

/** Native VIEW DDL through the injected parser ([[GraftSqlParser]] —
  * round 13): `CREATE [OR REPLACE] VIEW [IF NOT EXISTS] … AS …`,
  * `DROP VIEW [IF EXISTS] …` and `SHOW VIEWS IN …` work as plain SQL
  * statements against a graft catalog (vanilla Spark 4.1 hard-wires
  * view DDL to the session catalog), while everything else — including
  * temp-view DDL and statements on other catalogs — delegates to the
  * vanilla parser untouched.
  */
class GraftViewDdlSpec extends SparkSpec {

  private def freshCatalog(): String = {
    val root = Files.createTempDirectory("graft_vddl").toString
    val cat = s"gvd_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  test("CREATE VIEW / SHOW VIEWS / SELECT through / CREATE OR REPLACE / " +
    "DROP VIEW — the full native-DDL lifecycle on a graft catalog") {
    val cat = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.ev (k BIGINT, cents BIGINT)
      TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"INSERT INTO $cat.db.ev SELECT id, id * 10 FROM range(20)")
    spark.sql(s"""CREATE VIEW $cat.db.pricey AS
      SELECT k, cents FROM $cat.db.ev WHERE cents >= 100""")
    // SELECT through the view (resolution rule inlines the stored SQL)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.db.pricey")
      .collect()(0).getLong(0) == 10L)
    // SHOW VIEWS IN <cat>.<ns> lists it with the vanilla output shape
    val shown = spark.sql(s"SHOW VIEWS IN $cat.db").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(shown.contains(("db", "pricey", false)), shown.mkString(", "))
    // a second CREATE VIEW rejects; IF NOT EXISTS no-ops
    intercept[Exception] {
      spark.sql(s"CREATE VIEW $cat.db.pricey AS SELECT 1 AS one")
    }
    spark.sql(s"CREATE VIEW IF NOT EXISTS $cat.db.pricey AS SELECT 1 AS one")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.db.pricey")
      .collect()(0).getLong(0) == 10L, "IF NOT EXISTS must not replace")
    // CREATE OR REPLACE swaps the definition
    spark.sql(s"""CREATE OR REPLACE VIEW $cat.db.pricey AS
      SELECT k FROM $cat.db.ev WHERE cents < 50""")
    val cols = spark.sql(s"SELECT * FROM $cat.db.pricey").columns.toSeq
    assert(cols == Seq("k"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.pricey")
      .collect()(0).getLong(0) == 5L)
    // broken SQL fails the DDL, not the first read
    intercept[Exception] {
      spark.sql(s"CREATE OR REPLACE VIEW $cat.db.pricey AS SELECT nope FROM $cat.db.ev")
    }
    // a COMMAND body is a PARSE error (vanilla semantics) — and is
    // NEVER executed
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      spark.sql(s"CREATE OR REPLACE VIEW $cat.db.evil AS DROP TABLE $cat.db.ev")
    }
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.ev").collect()(0)
      .getLong(0) == 20L, "the command body must not have executed")
    // DROP VIEW removes it; a second drop needs IF EXISTS
    spark.sql(s"DROP VIEW $cat.db.pricey")
    intercept[Exception] { spark.sql(s"SELECT * FROM $cat.db.pricey").collect() }
    intercept[Exception] { spark.sql(s"DROP VIEW $cat.db.pricey") }
    spark.sql(s"DROP VIEW IF EXISTS $cat.db.pricey") // no-op, no error
    assert(spark.sql(s"SHOW VIEWS IN $cat.db").collect().isEmpty)
  }

  test("ALTER VIEW … AS redefines an existing view; a missing view " +
    "errors; SET TBLPROPERTIES still delegates to the native path") {
    val cat = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.t (k BIGINT)
      TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id FROM range(10)")
    spark.sql(s"CREATE VIEW $cat.db.v AS SELECT k FROM $cat.db.t")
    spark.sql(s"""ALTER VIEW $cat.db.v AS
      SELECT k * 2 AS twice FROM $cat.db.t WHERE k < 3""")
    val rows = spark.sql(s"SELECT twice FROM $cat.db.v ORDER BY twice")
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(0L, 2L, 4L))
    intercept[Exception] {
      spark.sql(s"ALTER VIEW $cat.db.ghost AS SELECT 1 AS one")
    }
    // command bodies reject at parse time here too
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      spark.sql(s"ALTER VIEW $cat.db.v AS DROP TABLE $cat.db.t")
    }
    // ALTER VIEW … SET/UNSET TBLPROPERTIES route to the catalog's
    // alterView (vanilla never consults a V2 ViewCatalog for these);
    // double-quoted values are the vanilla stringLit too
    spark.sql(s"""ALTER VIEW $cat.db.v SET TBLPROPERTIES
      ('note' = 'hi', owner = 'me', "retention" = "7d")""")
    val gc = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[graft.sources.GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("db"), "v")
    assert(gc.loadView(ident).properties().get("note") == "hi")
    assert(gc.loadView(ident).properties().get("owner") == "me")
    assert(gc.loadView(ident).properties().get("retention") == "7d")
    // ALTER VIEW … AS PRESERVES user properties (vanilla semantic)
    spark.sql(s"ALTER VIEW $cat.db.v AS SELECT k AS again FROM $cat.db.t")
    assert(gc.loadView(ident).properties().get("note") == "hi",
      "redefining the body must not wipe TBLPROPERTIES")
    spark.sql(s"ALTER VIEW $cat.db.v UNSET TBLPROPERTIES ('note')")
    assert(!gc.loadView(ident).properties().containsKey("note"))
    // UNSET of a MISSING key errors without IF EXISTS (a typo must not
    // be swallowed), passes with it
    val e3 = intercept[Exception] {
      spark.sql(s"ALTER VIEW $cat.db.v UNSET TBLPROPERTIES ('typo_key')")
    }
    assert(e3.getMessage.contains("typo_key"), e3.getMessage)
    spark.sql(s"ALTER VIEW $cat.db.v UNSET TBLPROPERTIES IF EXISTS ('typo_key')")
    spark.sql(s"DROP VIEW $cat.db.v")
  }

  test("backtick-quoted identifiers parse (incl. doubled backticks)") {
    val cat = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.t (k BIGINT)
      TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1)")
    spark.sql(s"CREATE VIEW `$cat`.`db`.`my view` AS SELECT k FROM $cat.db.t")
    assert(spark.sql(s"SELECT * FROM $cat.db.`my view`").collect().length == 1)
    val shown = spark.sql(s"SHOW VIEWS IN `$cat`.db").collect()
      .map(_.getString(1)).toSeq
    assert(shown == Seq("my view"))
    spark.sql(s"DROP VIEW `$cat`.db.`my view`")
  }

  test("temp views win 1-part resolution even under a graft current " +
    "catalog: DROP VIEW t drops the TEMP view, never a persisted one") {
    val cat = freshCatalog()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE VIEW $cat.db.shade AS SELECT 1 AS one")
    val prevCat = spark.catalog.currentCatalog()
    try {
      spark.sql(s"USE $cat.db")
      spark.sql("CREATE TEMPORARY VIEW shade AS SELECT 2 AS two")
      // vanilla resolution: the TEMP view wins the 1-part name
      spark.sql("DROP VIEW shade")
      // the persisted graft view SURVIVED the temp drop (and now wins
      // the 1-part read through the resolution rule)
      assert(spark.sql("SELECT one FROM shade").collect()(0).getInt(0) == 1)
      assert(spark.sql(s"SELECT one FROM $cat.db.shade").collect()(0)
        .getInt(0) == 1)
      // with no temp view in the way, the 1-part drop reaches graft
      spark.sql("DROP VIEW shade")
      assert(spark.sql(s"SHOW VIEWS IN $cat.db").collect().isEmpty)
    } finally spark.sql(s"USE $prevCat")
  }

  test("everything else delegates: temp-view DDL and session-catalog " +
    "view DDL behave exactly as vanilla") {
    // TEMPORARY view DDL is untouched
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW gvddl_tmp AS SELECT 7 AS x")
    assert(spark.sql("SELECT x FROM gvddl_tmp").collect()(0).getInt(0) == 7)
    spark.sql("DROP VIEW gvddl_tmp")
    // session-catalog (current catalog ≠ graft) CREATE VIEW still routes
    // to the vanilla path — a view in the session catalog
    spark.sql("CREATE VIEW gvddl_sess AS SELECT 8 AS y")
    try
      assert(spark.sql("SELECT y FROM gvddl_sess").collect()(0).getInt(0) == 8)
    finally spark.sql("DROP VIEW gvddl_sess")
    // and bare SHOW VIEWS stays the session-catalog listing (no crash)
    spark.sql("SHOW VIEWS").collect()
  }

  test("CREATE VIEW with column list / COMMENT / TBLPROPERTIES; read " +
    "back via SHOW CREATE VIEW and DESCRIBE [EXTENDED]") {
    val cat = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.ev (k BIGINT, cents BIGINT)
      TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"INSERT INTO $cat.db.ev SELECT id, id * 10 FROM range(20)")
    spark.sql(s"""CREATE VIEW $cat.db.fancy
      (key COMMENT 'the row key', money)
      COMMENT 'a fancy view'
      TBLPROPERTIES ('owner.team' = 'etl', 'tier' = 'gold')
      AS SELECT k, cents FROM $cat.db.ev WHERE cents >= 50""")
    // the column list RENAMES the outputs
    val df = spark.sql(s"SELECT * FROM $cat.db.fancy")
    assert(df.columns.toSeq == Seq("key", "money"))
    assert(df.collect().length == 15)
    // DESCRIBE: aliased names, types, stored comments
    val desc = spark.sql(s"DESCRIBE $cat.db.fancy").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(desc.toSeq == Seq(("key", "bigint", "the row key"),
      ("money", "bigint", null)), desc.mkString(", "))
    // DESCRIBE EXTENDED adds view text + properties
    val ext = spark.sql(s"DESCRIBE EXTENDED $cat.db.fancy").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ext("View Text").contains("cents >= 50"))
    assert(ext("Comment") == "a fancy view")
    assert(ext("View Properties").contains("owner.team=etl"))
    // SHOW CREATE VIEW reconstructs RUNNABLE DDL: drop + replay = same
    val ddl = spark.sql(s"SHOW CREATE VIEW $cat.db.fancy")
      .collect()(0).getString(0)
    assert(ddl.contains("COMMENT 'a fancy view'") &&
      ddl.contains("`key` COMMENT 'the row key'") &&
      ddl.contains("'tier' = 'gold'"), ddl)
    spark.sql(s"DROP VIEW $cat.db.fancy")
    spark.sql(ddl)
    assert(spark.sql(s"SELECT * FROM $cat.db.fancy").columns.toSeq ==
      Seq("key", "money"))
    val desc2 = spark.sql(s"DESC TABLE $cat.db.fancy").collect()
      .map(r => (r.getString(0), r.getString(2)))
    assert(desc2.toSeq == Seq(("key", "the row key"), ("money", null)))
    // SHOW CREATE TABLE naming the VIEW also serves the view DDL
    assert(spark.sql(s"SHOW CREATE TABLE $cat.db.fancy")
      .collect()(0).getString(0).contains("CREATE VIEW"))
    // a mismatched column list rejects at CREATE
    val e = intercept[Exception] {
      spark.sql(s"""CREATE VIEW $cat.db.broken (one, two, three)
        AS SELECT k FROM $cat.db.ev""")
    }
    assert(e.getMessage.contains("names 3 columns"), e.getMessage)
    // ALTER VIEW … RENAME TO: metadata (aliases/comments/props) rides
    // along; the old name is gone
    spark.sql(s"ALTER VIEW $cat.db.fancy RENAME TO $cat.db.fancier")
    assert(spark.sql(s"SELECT * FROM $cat.db.fancier").columns.toSeq ==
      Seq("key", "money"))
    assert(spark.sql(s"DESCRIBE $cat.db.fancier").collect()(0)
      .getString(2) == "the row key")
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.db.fancy").collect()
    }
    intercept[Exception] { // renaming onto an EXISTING name rejects
      spark.sql(s"ALTER VIEW $cat.db.fancier RENAME TO $cat.db.fancier")
    }
    spark.sql(s"ALTER VIEW $cat.db.fancier RENAME TO $cat.db.fancy")
    // graft TABLES keep their native DESCRIBE path
    val tdesc = spark.sql(s"DESCRIBE $cat.db.ev").collect()
      .map(_.getString(0))
    assert(tdesc.contains("k") && tdesc.contains("cents"))
  }
}
