package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** CREATE OR REPLACE TABLE / REPLACE TABLE … AS SELECT over the graft
  * catalog — ATOMIC since round 13 (`GraftCatalog` implements
  * StagingTableCatalog): the replacement builds invisibly in a
  * `gen_<uuid>` subdirectory and commit is ONE atomic `_graft_ptr`
  * move, so readers see the old table until the instant they see the
  * new one and NO crash window can lose the table (the non-atomic
  * drop+create gap is retired). Remaining documented divergence from
  * Delta: REPLACE starts a FRESH history (version clock resets) — the
  * old table's time travel does not carry across a replace. A REPLACE
  * of a missing table errors; CREATE OR REPLACE creates it.
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

  test("REPLACE plans through the ATOMIC staged exec, and the crash " +
    "window is gone: an uncommitted stage leaves the old table fully " +
    "readable; abort cleans the staged generation") {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.t (k BIGINT, v BIGINT)
      TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"INSERT INTO $cat.db.t (k, v) VALUES (1, 10), (2, 20)")
    // the planner must pick the ATOMIC exec (StagingTableCatalog)
    val plan = spark.sql(s"""EXPLAIN REPLACE TABLE $cat.db.t
      TBLPROPERTIES ('keys'='k') AS SELECT CAST(5 AS BIGINT) AS k""")
      .collect()(0).getString(0)
    assert(plan.contains("AtomicReplaceTableAsSelect"), plan)

    val gc = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("db"), "t")
    val info = new org.apache.spark.sql.connector.catalog.TableInfo.Builder()
      .withColumns(Array(org.apache.spark.sql.connector.catalog.Column
        .create("k", org.apache.spark.sql.types.LongType)))
      .withPartitions(Array.empty)
      .withProperties(java.util.Map.of("keys", "k"))
      .build()
    // STAGE a replacement and DON'T commit — the simulated crash. The
    // old table must stay fully readable (the drop+create fallback
    // would have lost it here).
    val staged = gc.stageReplace(ident, info)
    assert(spark.sql(s"SELECT sum(v) FROM $cat.db.t").collect()(0)
      .getLong(0) == 30L, "old table must survive an uncommitted stage")
    // a SECOND stage committing while the first 'crashed' wins cleanly
    val staged2 = gc.stageReplace(ident, info)
    staged2.commitStagedChanges()
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t").collect()(0)
      .getLong(0) == 0L)
    assert(spark.sql(s"SELECT * FROM $cat.db.t").schema.fieldNames.toSeq
      == Seq("k"))
    // the first (crashed) stage aborts away without touching the live
    // table
    staged.abortStagedChanges()
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t").collect()(0)
      .getLong(0) == 0L)
    // the table directory is now generational: pointer + one live gen
    // (the superseded legacy files were swept post-commit)
    val entries = java.nio.file.Paths.get(s"$root/db/t").toFile
      .listFiles().map(_.getName).toSet
    assert(entries.contains("_graft_ptr"), entries)
    assert(entries.count(_.startsWith("gen_")) == 1, entries)
    assert(!entries.contains("_graft_meta.json"), entries)
    // generational tables keep working end-to-end: insert, replace
    // again (old gen swept), drop
    spark.sql(s"INSERT INTO $cat.db.t (k) VALUES (42)")
    assert(spark.sql(s"SELECT k FROM $cat.db.t").collect()(0).getLong(0) == 42L)
    spark.sql(s"""CREATE OR REPLACE TABLE $cat.db.t (z STRING)
      TBLPROPERTIES ('keys'='z')""")
    val entries2 = java.nio.file.Paths.get(s"$root/db/t").toFile
      .listFiles().map(_.getName).toSet
    assert(entries2.count(_.startsWith("gen_")) == 1,
      s"the superseded generation must be swept: $entries2")
    assert(spark.sql(s"SHOW TABLES IN $cat.db").collect()
      .map(_.getString(1)).contains("t"))
    spark.sql(s"DROP TABLE $cat.db.t")
    assert(!Files.exists(java.nio.file.Paths.get(s"$root/db/t")))
    // a replace RACING a drop: stage, drop the table, then commit —
    // strict REPLACE semantics reject at the atomic commit point
    spark.sql(s"""CREATE TABLE $cat.db.t (k BIGINT)
      TBLPROPERTIES ('keys'='k')""")
    val staged3 = gc.stageReplace(ident, info)
    spark.sql(s"DROP TABLE $cat.db.t")
    intercept[Exception] { staged3.commitStagedChanges() }
    assert(!Files.exists(java.nio.file.Paths.get(s"$root/db/t")))
  }

  test("SELF-replace: REPLACE TABLE t AS SELECT … FROM t reads the old " +
    "generation while writing the new — only the staged swap makes " +
    "this well-defined") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.s (k BIGINT, v BIGINT)
      TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"INSERT INTO $cat.db.s SELECT id, id * 10 FROM range(100)")
    spark.sql(s"""REPLACE TABLE $cat.db.s TBLPROPERTIES ('keys'='k')
      AS SELECT k, v * 2 AS v2 FROM $cat.db.s WHERE k % 2 = 0""")
    val got = spark.sql(s"SELECT sum(v2), count(*) FROM $cat.db.s")
      .collect()(0)
    assert((got.getLong(0), got.getLong(1)) == (2 * 10 * (0 until 100 by 2).sum.toLong, 50L))
  }

  test("staged-commit hardening: racing CREATEs — exactly one wins; a " +
    "vanished staged generation aborts instead of pointing at garbage; " +
    "an aborted staged CREATE leaves no debris blocking DROP NAMESPACE") {
    val (cat, root) = freshCatalog()
    val gc = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
    spark.sql(s"SELECT 1").collect()
    Files.createDirectories(java.nio.file.Paths.get(s"$root/db"))
    def info() = new org.apache.spark.sql.connector.catalog.TableInfo.Builder()
      .withColumns(Array(org.apache.spark.sql.connector.catalog.Column
        .create("k", org.apache.spark.sql.types.LongType)))
      .withPartitions(Array.empty)
      .withProperties(java.util.Map.of("keys", "k"))
      .build()
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("db"), "race")
    // two racing staged CREATEs: both stage, both commit — exactly one
    // wins, the loser gets TableAlreadyExists (no silent clobber)
    val s1 = gc.stageCreate(ident, info())
    val s2 = gc.stageCreate(ident, info())
    s1.commitStagedChanges()
    intercept[org.apache.spark.sql.catalyst.analysis
      .TableAlreadyExistsException] { s2.commitStagedChanges() }
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.race").collect()(0)
      .getLong(0) == 0L)
    spark.sql(s"DROP TABLE $cat.db.race")
    // a staged generation DELETED before commit (external sweep /
    // manual rm) aborts loudly; the previous state stays intact
    spark.sql(s"CREATE TABLE $cat.db.v (k BIGINT) TBLPROPERTIES ('keys'='k')")
    spark.sql(s"INSERT INTO $cat.db.v VALUES (1)")
    val identV = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("db"), "v")
    val s3 = gc.stageReplace(identV, info())
    // find and delete the staged gen dir
    val vDir = java.nio.file.Paths.get(s"$root/db/v")
    val gens = vDir.toFile.listFiles().filter(_.getName.startsWith("gen_"))
    assert(gens.length == 1)
    graft.operators.Fs.deleteTree(gens(0).toPath)
    intercept[IllegalStateException] { s3.commitStagedChanges() }
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.v").collect()(0)
      .getLong(0) == 1L, "the old table must survive the aborted commit")
    // an ABORTED staged CREATE sweeps its bare table dir, so
    // DROP NAMESPACE cascade is not blocked by debris
    val identW = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("db"), "w")
    val s4 = gc.stageCreate(identW, info())
    s4.abortStagedChanges()
    assert(!Files.exists(java.nio.file.Paths.get(s"$root/db/w")),
      "abort must not leave a bare table directory behind")
  }

  test("vacuum sweeps crashed-stage generation debris (grace-gated), " +
    "never the current generation") {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.g (k BIGINT)
      TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""CREATE OR REPLACE TABLE $cat.db.g
      TBLPROPERTIES ('keys'='k') AS SELECT CAST(id AS BIGINT) AS k
      FROM range(10)""")
    val dir = java.nio.file.Paths.get(s"$root/db/g")
    // plant crashed-stage debris
    Files.createDirectories(dir.resolve("gen_deadbeef"))
    Files.writeString(dir.resolve("gen_deadbeef").resolve("junk"), "x")
    val current = Files.readString(dir.resolve("_graft_ptr")).trim
    // within the grace window nothing sweeps (a stage may be in flight)
    spark.sql(s"CALL $cat.system.vacuum('db.g')")
    assert(Files.isDirectory(dir.resolve("gen_deadbeef")))
    // past the grace it does — and only the non-current generation
    spark.conf.set("spark.graft.vacuum.generationGraceMs", "0")
    try spark.sql(s"CALL $cat.system.vacuum('db.g')")
    finally spark.conf.unset("spark.graft.vacuum.generationGraceMs")
    assert(!Files.exists(dir.resolve("gen_deadbeef")))
    assert(Files.isDirectory(dir.resolve(current)))
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.g").collect()(0)
      .getLong(0) == 10L)
  }
}
