package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

import graft.SparkSpec
import graft.operators.{GraftTable, StaleTxnAnchorException}

/** Round-13 regression tests for the round-12 review findings:
  *
  *   1. `drop_mview` refuses to destroy a user table that merely
  *      happens to be named `<view>_state` (no mview config) and a
  *      plain view with no state table at all;
  *   2. concurrent `refresh_mview` can NOT double-count: the txn
  *      anchor the delta was computed FROM is pinned atomically with
  *      the commit ([[GraftTable.mergeBatch]] `expectedLastBatch`);
  *   3. a `create_mview` that fails AFTER the state table committed
  *      rolls the state table back, so a retry is not blocked by
  *      orphaned debris;
  *   4. view files round-trip trailing-empty column aliases/comments
  *      (count-carrying multi fields, split limit -1);
  *   5. `ALTER TABLE` batches are all-or-nothing: a nested ALTER
  *      COLUMN (or any unsupported change) rejects BEFORE a valid
  *      AddColumn in the same batch lands.
  */
class GraftR13AdviceSpec extends SparkSpec {

  import spark.implicits._

  private def freshCatalog(): (String, GraftCatalog) = {
    val root = Files.createTempDirectory("graft_r13").toString
    val cat = s"gr13_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"SELECT 1").collect() // force catalog registration lazily
    val gc = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
    (cat, gc)
  }

  test("drop_mview refuses a same-named user table without the mview " +
    "config, and a plain view with no state table") {
    val (cat, _) = freshCatalog()
    // a USER table that happens to be named foo_state + a plain view foo
    spark.sql(s"""CREATE TABLE $cat.db.foo_state (k BIGINT, v BIGINT)
      TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"INSERT INTO $cat.db.foo_state VALUES (1, 10)")
    spark.sql(s"""CALL $cat.system.create_view('db.foo',
      'SELECT k, v FROM $cat.db.foo_state')""")
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.drop_mview('db.foo')").collect()
    }
    assert(e.getMessage.contains("not a state table created by create_mview") ||
      e.getMessage.contains("not a materialized view"), e.getMessage)
    // NOTHING was destroyed
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.foo_state")
      .collect()(0).getLong(0) == 1L)
    assert(spark.sql(s"CALL $cat.system.show_views('db')").collect()
      .map(_.getString(1)).contains("foo"))
    // a plain view with NO state table: refuse too (drop_view handles it)
    spark.sql(s"""CALL $cat.system.create_view('db.solo',
      'SELECT 1 AS one')""")
    val e2 = intercept[Exception] {
      spark.sql(s"CALL $cat.system.drop_mview('db.solo')").collect()
    }
    assert(e2.getMessage.contains("not a materialized view"), e2.getMessage)
    // dropping a NONEXISTENT mview still reports false (no error)
    assert(!spark.sql(s"CALL $cat.system.drop_mview('db.ghost')")
      .collect()(0).getBoolean(1))
  }

  test("mergeBatch expectedLastBatch: a stale anchor aborts with " +
    "StaleTxnAnchorException instead of double-applying") {
    val dir = Files.createTempDirectory("graft_r13_anchor").toString
    val t = new GraftTable(spark, dir, Seq("k"), GraftTable.SyntheticPartition)
    t.createIfNotExists(Seq((1L, 0L)).toDF("k", "n").schema)
    t.append(Seq((1L, 0L)).toDF("k", "n"))
    def fold(batch: Long, add: Long, expect: Long): Boolean =
      t.mergeBatch("mv", batch, Seq((1L, add)).toDF("k", "n"),
        matched = Seq(GraftTable.MatchedUpdate(
          org.apache.spark.sql.functions.lit(true),
          Map("n" -> (org.apache.spark.sql.functions.col("n") +
            GraftTable.src("n"))))),
        expectedLastBatch = Some(expect))
    assert(fold(5, 10, -1L)) // first fold from the no-anchor state
    // a second refresher that ALSO computed its delta from anchor -1
    // (the double-count scenario) must abort loudly …
    intercept[StaleTxnAnchorException] { fold(7, 99, -1L) }
    // … and a replay of the committed batch still skips silently
    assert(!fold(5, 10, 5L))
    // folding from the CORRECT anchor applies
    assert(fold(7, 5, 5L))
    assert(t.read.select("n").as[Long].collect().toSeq == Seq(15L))
  }

  test("two concurrent refresh_mview calls never double-count") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.ev (k BIGINT, user_id BIGINT,
        cents BIGINT) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.ev
      SELECT id, id % 5, id * 10 FROM range(50)""")
    spark.sql(s"""CALL $cat.system.create_mview('db.spend',
      base => 'db.ev', keys => 'user_id', measures => 'cents')""")
    spark.sql(s"""INSERT INTO $cat.db.ev
      SELECT id, id % 5, id FROM range(50, 90)""")
    // two refreshes race on the same (lastV, curV] window
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (1 to 2).map(_ => Future {
      spark.sql(s"CALL $cat.system.refresh_mview('db.spend')").collect()(0)
    })
    fs.foreach(f => Await.result(f, 120.seconds))
    val got = spark.sql(
      s"SELECT user_id, n_rows, sum_cents FROM $cat.db.spend")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val want = spark.sql(s"""SELECT user_id, count(*) AS n,
        CAST(sum(cents) AS DOUBLE) AS s FROM $cat.db.ev GROUP BY user_id""")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got == want, s"concurrent refresh double-counted: $got vs $want")
  }

  test("create_mview failure after the state commit rolls back: no " +
    "orphaned state table, retry succeeds") {
    val (cat, _) = freshCatalog()
    // a measure column whose name parquet REJECTS (space): the state
    // write fails AFTER the state table's creation — the crash window
    // the rollback exists for
    spark.sql(s"""CREATE TABLE $cat.db.ev (k BIGINT, user_id BIGINT,
        `bad col` BIGINT, cents BIGINT) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.ev VALUES (1, 1, 5, 10)""")
    intercept[Exception] {
      spark.sql(s"""CALL $cat.system.create_mview('db.spend',
        base => 'db.ev', keys => 'user_id', measures => 'bad col')""")
        .collect()
    }
    // the state table did NOT survive the failure …
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.db.spend_state").collect()
    }
    // … so the retry (with a valid measure) is not blocked
    spark.sql(s"""CALL $cat.system.create_mview('db.spend',
      base => 'db.ev', keys => 'user_id', measures => 'cents')""")
    assert(spark.sql(s"SELECT sum_cents FROM $cat.db.spend").collect()(0)
      .getDouble(0) == 10.0)
  }

  test("view files round-trip trailing-empty aliases/comments and " +
    "distinguish Seq(\"\") from Seq()") {
    val root = Files.createTempDirectory("graft_r13_views").toString
    val ident = Identifier.of(Array("db"), "v1")
    val schema = StructType(Seq(
      org.apache.spark.sql.types.StructField("a", LongType),
      org.apache.spark.sql.types.StructField("b", LongType)))
    GraftViews.write(root, ident, "v1", "SELECT 1 AS a, 2 AS b", "cat",
      Seq("db"), schema, Seq("a", "b"),
      columnAliases = Seq("x", ""),      // trailing EMPTY alias
      columnComments = Seq(""),          // Seq("") — not Seq()
      properties = Map("p" -> ""))
    val v = GraftViews.read(root, ident).get
    assert(v.columnAliases().toSeq == Seq("x", ""))
    assert(v.columnComments().toSeq == Seq(""))
    assert(v.propsMap == Map("p" -> ""))
    // empty Seq round-trips as EMPTY (count 0), not Seq(""))
    val ident2 = Identifier.of(Array("db"), "v2")
    GraftViews.write(root, ident2, "v2", "SELECT 1", "cat", Seq(), schema,
      Seq(), Seq(), Seq(), Map())
    val v2 = GraftViews.read(root, ident2).get
    assert(v2.currentNamespace().isEmpty && v2.columnAliases().isEmpty &&
      v2.columnComments().isEmpty)
  }

  test("ALTER TABLE batch mixing a valid AddColumn with a nested ALTER " +
    "COLUMN rejects all-or-nothing (the add does not land)") {
    val (cat, gc) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.t (k BIGINT, v BIGINT)
      TBLPROPERTIES ('keys'='k')""")
    val ident = Identifier.of(Array("db"), "t")
    val before = gc.loadTable(ident).columns().map(_.name).toSeq
    intercept[Exception] {
      gc.alterTable(ident,
        TableChange.addColumn(Array("fresh"), IntegerType, true),
        TableChange.updateColumnType(Array("nested", "leaf"), LongType))
    }
    val after = gc.loadTable(ident).columns().map(_.name).toSeq
    assert(after == before,
      s"the batch must be all-or-nothing: $before -> $after")
    // same for a batch with an UNSUPPORTED change class (SetProperty
    // became SUPPORTED in round 14 — use nullability, still rejected)
    intercept[Exception] {
      gc.alterTable(ident,
        TableChange.addColumn(Array("fresh2"), IntegerType, true),
        TableChange.updateColumnNullability(Array("v"), false))
    }
    assert(gc.loadTable(ident).columns().map(_.name).toSeq == before)
    // …and a batch mixing an AddColumn with a REJECTED property (config
    // keys are immutable) is also all-or-nothing
    intercept[Exception] {
      gc.alterTable(ident,
        TableChange.addColumn(Array("fresh3"), IntegerType, true),
        TableChange.setProperty("keys", "v"))
    }
    assert(gc.loadTable(ident).columns().map(_.name).toSeq == before)
    // a VALID mixed batch (round 14): both the add and the property land
    gc.alterTable(ident,
      TableChange.addColumn(Array("fresh4"), IntegerType, true),
      TableChange.setProperty("foo", "bar"))
    assert(gc.loadTable(ident).columns().map(_.name).contains("fresh4"))
    assert(gc.loadTable(ident).properties().get("foo") == "bar")
  }
}
