package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.GraftTableMeta

/** Round-12 schema evolution surface:
  *
  *   - `MERGE WITH SCHEMA EVOLUTION` (the Spark 4 native capability —
  *     `AUTOMATIC_SCHEMA_EVOLUTION`): INSERT * / UPDATE SET * /
  *     explicit new-column assignments evolve the sidecar schema,
  *     metadata-only, and old rows project null;
  *   - plain MERGE still REJECTS unknown assignment targets;
  *   - a type CONFLICT on an existing column only passes up the
  *     widening lattice (INT source into BIGINT column fine; STRING
  *     into BIGINT rejects the statement, nothing commits);
  *   - composition with COLUMN MAPPING: a column dropped and a
  *     same-named column re-added via merge evolution gets a FRESH
  *     physical slot — the dropped bytes can never resurrect;
  *   - `spark.graft.schema.autoMerge` appends (the Delta autoMerge
  *     shape): by-name writes with new columns evolve, positionally-
  *     shaped writes whose names do not line up fail loudly;
  *   - evolved tables stay fully operable: DELETE (the row-level
  *     strategy claims the Project-wrapped target), streaming reads
  *     (reordering reader factory) and time travel all keep working.
  */
class GraftSchemaEvolutionSpec extends SparkSpec {

  private def freshCatalog(): (String, String) = {
    val root = Files.createTempDirectory("graft_sevo").toString
    val cat = s"gsevo_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def seed(cat: String, name: String = "t"): Unit = {
    spark.sql(s"""CREATE TABLE $cat.db.$name (k BIGINT, v BIGINT, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.$name (k, v, pk) VALUES
      (1, 10, 0), (2, 20, 1)""")
  }

  test("MERGE WITH SCHEMA EVOLUTION: INSERT * adds the new column " +
    "metadata-only; old rows project null; plain MERGE still rejects") {
    val (cat, root) = freshCatalog()
    seed(cat)
    spark.range(2, 5).selectExpr("id AS k", "id*10 AS v", "id % 2 AS pk",
      "concat('n', id) AS note").createOrReplaceTempView("sevo_src1")
    // plain MERGE: unknown target column rejects (no silent evolution)
    intercept[Throwable] {
      spark.sql(s"""MERGE INTO $cat.db.t t USING sevo_src1 s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET note = s.note""")
    }
    val before = Files.walk(java.nio.file.Paths.get(s"$root/db/t")).toArray
      .map(_.toString).count(_.endsWith(".parquet"))
    spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.db.t t
      USING sevo_src1 s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET note = s.note
      WHEN NOT MATCHED THEN INSERT *""")
    val rows = spark.sql(s"SELECT k, v, note FROM $cat.db.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)).getOrElse("-"))).toSeq
    assert(rows == Seq((1L, 10L, "-"), (2L, 20L, "n2"), (3L, 30L, "n3"),
      (4L, 40L, "n4")))
    // the evolved column reports LAST (the append-at-end contract)
    assert(spark.sql(s"SELECT * FROM $cat.db.t").columns.toSeq
      == Seq("k", "v", "pk", "note"))
    // old partition-0 file untouched by the ADD itself: k=1 was never
    // matched, its partition never rewrote beyond the merge's touched
    // set — evolution added no rewrite of its own
    assert(before > 0)
  }

  test("type conflict: a source column that cannot WIDEN rejects the " +
    "evolving merge; a lattice-narrower source up-casts fine") {
    val (cat, _) = freshCatalog()
    seed(cat)
    // v STRING into v BIGINT: no widening — statement rejects, nothing lands
    spark.range(0, 2).selectExpr("id + 10 AS k", "concat('x', id) AS v",
      "id % 2 AS pk").createOrReplaceTempView("sevo_bad")
    intercept[Throwable] {
      spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.db.t t
        USING sevo_bad s ON t.k = s.k
        WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t").collect()(0)
      .getLong(0) == 2L)
    // INT source into the BIGINT column: narrower along the lattice —
    // a PLAIN merge up-casts it (no evolution needed); the evolving
    // form rejects with the actionable hint (the engine cannot narrow
    // a declared type without reinterpreting written bytes)
    spark.range(0, 1).selectExpr("100L AS k", "CAST(7 AS INT) AS v",
      "0L AS pk").createOrReplaceTempView("sevo_ok")
    val e = intercept[Throwable] {
      spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.db.t t
        USING sevo_ok s ON t.k = s.k
        WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(e.getMessage.contains("drop WITH SCHEMA EVOLUTION"),
      s"expected the actionable narrowing hint, got: ${e.getMessage}")
    spark.sql(s"""MERGE INTO $cat.db.t t
      USING sevo_ok s ON t.k = s.k
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql(s"SELECT v FROM $cat.db.t WHERE k = 100").collect()(0)
      .getLong(0) == 7L)
  }

  test("column-mapping composition: DROP COLUMN then merge-evolve a " +
    "same-named column — fresh physical slot, dropped bytes never " +
    "resurrect") {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.m (k BIGINT, note STRING, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.m (k, note, pk) VALUES
      (1, 'OLDBYTES', 0), (2, 'OLDBYTES2', 1)""")
    spark.sql(s"ALTER TABLE $cat.db.m DROP COLUMN note")
    spark.range(1, 3).selectExpr("id AS k", "id % 2 AS pk",
      "concat('new', id) AS note").createOrReplaceTempView("sevo_remap")
    spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.db.m t
      USING sevo_remap s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET note = s.note""")
    val vals = spark.sql(s"SELECT k, note FROM $cat.db.m ORDER BY k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(vals == Seq(1L -> "new1", 2L -> "new2"),
      "the re-added column must read the NEW values, never the dropped bytes")
    val gt = GraftTableMeta.open(spark, s"$root/db/m").get
    val (cmap, hidden) = gt.columnMap
    assert(hidden.contains("note"),
      s"the dropped physical slot must stay retired; hidden=$hidden")
    assert(cmap.get("note").exists(_ != "note"),
      s"the re-added column needs a FRESH physical slot; map=$cmap")
  }

  test("autoMerge appends: by-name writes with a new column evolve " +
    "(conf on), arity-mismatched writes reject with conf off, and " +
    "positionally-shaped writes whose names don't line up fail loudly") {
    val (cat, _) = freshCatalog()
    seed(cat, "a")
    val extra = spark.range(100, 103).selectExpr("id AS k", "id AS v",
      "id % 2 AS pk", "concat('w', id) AS tag")
    intercept[Throwable] { extra.writeTo(s"$cat.db.a").append() }
    spark.conf.set("spark.graft.schema.autoMerge", "true")
    try {
      extra.writeTo(s"$cat.db.a").append()
      assert(spark.sql(s"SELECT count(tag) FROM $cat.db.a").collect()(0)
        .getLong(0) == 3L)
      // INSERT INTO ... BY NAME rides the same path
      spark.sql(s"""INSERT INTO $cat.db.a BY NAME
        SELECT 200L AS k, 1L AS v, 0L AS pk, 'z' AS zcol""")
      assert(spark.sql(s"SELECT count(zcol) FROM $cat.db.a").collect()(0)
        .getLong(0) == 1L)
      // positionally-shaped (names don't carry the keys): loud failure
      intercept[Throwable] {
        spark.sql(s"INSERT INTO $cat.db.a SELECT 1L AS a, 2L AS b, 3L AS c")
      }
    } finally spark.conf.set("spark.graft.schema.autoMerge", "false")
  }

  test("evolved tables stay fully operable: DELETE (Project-wrapped " +
    "target claimed), UPDATE, streaming read (reordered), time travel") {
    val (cat, root) = freshCatalog()
    seed(cat, "o")
    val gt = GraftTableMeta.open(spark, s"$root/db/o").get
    val v0 = gt.currentVersion
    spark.range(5, 9).selectExpr("id AS k", "id*10 AS v", "id % 2 AS pk",
      "concat('e', id) AS ecol").createOrReplaceTempView("sevo_op")
    spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.db.o t
      USING sevo_op s ON t.k = s.k
      WHEN NOT MATCHED THEN INSERT *""")
    // DELETE through the evolved (Project-wrapped) relation
    spark.sql(s"DELETE FROM $cat.db.o WHERE k = 6")
    // UPDATE referencing the evolved column
    spark.sql(s"UPDATE $cat.db.o SET ecol = 'upd' WHERE k = 7")
    val now = spark.sql(s"SELECT k, ecol FROM $cat.db.o ORDER BY k")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("-"))
    assert(now.toSeq == Seq(1L -> "-", 2L -> "-", 5L -> "e5",
      7L -> "upd", 8L -> "e8"))
    // time travel to the pre-evolution version still reads (old schema)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.o VERSION AS OF $v0")
      .collect()(0).getLong(0) == 2L)
    // streaming read over the evolved table: the reordering reader
    // factory must produce rows matching the declared order
    val drained = spark.readStream.table(s"$cat.db.o")
      .writeStream.format("memory").queryName("sevo_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    drained.awaitTermination(120000)
    assert(!drained.isActive)
    val streamed = spark.sql(
      "SELECT k, ecol FROM sevo_stream ORDER BY k").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("-")).toSeq
    assert(streamed == Seq(1L -> "-", 2L -> "-", 5L -> "e5",
      7L -> "upd", 8L -> "e8"),
      s"stream rows must arrive in declared column order; got $streamed")
    spark.sql("DROP TABLE IF EXISTS sevo_stream")
  }
}
