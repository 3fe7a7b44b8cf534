package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** GENERATED ALWAYS AS (expr) + GENERATED ALWAYS AS IDENTITY columns
  * (round 11, the native capability path): the analyzer hands the
  * specs on the Column objects, the schema sidecar persists them, and
  * `conform` applies them on EVERY write path — generated values
  * recompute through UPDATE/MERGE (the invariant holds by
  * construction), identity columns fill from a fresh block above the
  * current extremum (the table itself is the allocation state —
  * metadata-only watermark via the auto-added zone maps).
  */
class GraftGeneratedColumnSpec extends SparkSpec {

  private def freshCatalog(): (String, String) = {
    val root = Files.createTempDirectory("graft_gen").toString
    val cat = s"ggen_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  test("generated column: computed on insert, recomputed through " +
    "UPDATE, explicit values overwritten, referenced-column rename " +
    "rejects, time travel keeps old computed values") {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.g (k BIGINT, v BIGINT,
      twice BIGINT GENERATED ALWAYS AS (v * 2))
      TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"INSERT INTO $cat.db.g (k, v) VALUES (1, 10), (2, 20)")
    spark.sql(s"INSERT INTO $cat.db.g (k, v, twice) VALUES (3, 30, 999)")
    def rows() = spark.sql(s"SELECT k, v, twice FROM $cat.db.g").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows() == Set((1L, 10L, 20L), (2L, 20L, 40L), (3L, 30L, 60L)))

    val t = graft.operators.GraftTableMeta.open(spark, s"$root/db/g").get
    val v0 = t.currentVersion
    spark.sql(s"UPDATE $cat.db.g SET v = v + 5 WHERE k = 1")
    assert(rows() == Set((1L, 15L, 30L), (2L, 20L, 40L), (3L, 30L, 60L)))
    // pre-update computed value stays travelable
    assert(spark.sql(
      s"SELECT twice FROM $cat.db.g VERSION AS OF $v0 WHERE k = 1")
      .collect()(0).getLong(0) == 20L)

    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.db.g RENAME COLUMN v TO w")
    }
    assert(e.getMessage.contains("generated column"))
  }

  test("identity column: unique values respecting start/step, " +
    "explicit inserts kept, UPDATE preserves ids, reopened table " +
    "allocates above the watermark, negative step descends") {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.i (
      id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 3),
      v BIGINT) TBLPROPERTIES ('keys'='id')""")
    spark.sql(s"INSERT INTO $cat.db.i (v) VALUES (1), (2), (3)")
    def ids() = spark.sql(s"SELECT id FROM $cat.db.i").collect()
      .map(_.getLong(0)).toSeq
    val first = ids()
    assert(first.distinct.size == 3)
    assert(first.forall(i => i >= 100 && (i - 100) % 3 == 0))

    // second insert (reopened table instance) allocates strictly above
    spark.sql(s"INSERT INTO $cat.db.i (v) VALUES (4), (5)")
    val second = ids()
    assert(second.distinct.size == 5)
    assert(second.filterNot(first.contains).forall(_ > first.max))

    // explicit value rides through; UPDATE keeps every id
    spark.sql(s"INSERT INTO $cat.db.i (id, v) VALUES (77, 6)")
    spark.sql(s"UPDATE $cat.db.i SET v = v * 10 WHERE v <= 3")
    val after = ids()
    assert(after.distinct.size == 6 && after.contains(77L))
    assert(second.forall(after.contains))
    // the identity column was auto-added to the zone maps, so the
    // watermark read is metadata-only
    val t = graft.operators.GraftTableMeta.open(spark, s"$root/db/i").get
    assert(t.statsCols.contains("id"))

    spark.sql(s"""CREATE TABLE $cat.db.neg (
      id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 0 INCREMENT BY -2),
      v BIGINT) TBLPROPERTIES ('keys'='id')""")
    spark.sql(s"INSERT INTO $cat.db.neg (v) VALUES (1), (2)")
    spark.sql(s"INSERT INTO $cat.db.neg (v) VALUES (3)")
    val neg = spark.sql(s"SELECT id FROM $cat.db.neg").collect()
      .map(_.getLong(0)).toSeq
    assert(neg.distinct.size == 3)
    assert(neg.forall(i => i <= 0 && i % 2 == 0))
  }
}
