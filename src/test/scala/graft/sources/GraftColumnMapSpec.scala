package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.GraftTable

/** COLUMN MAPPING (round 11): RENAME COLUMN / DROP COLUMN are
  * metadata-only — files keep their physical names forever, reads
  * translate, dropped slots never resurrect. Mirrors Delta's
  * column-mapping contract.
  */
class GraftColumnMapSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val root = Files.createTempDirectory("graft_cmap").toString
    val cat = s"gcmap_${System.nanoTime()}_$n"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def dataFilesWithMtimes(dir: String): Map[String, Long] = {
    val root = java.nio.file.Paths.get(dir)
    val out = scala.collection.mutable.Map.empty[String, Long]
    Files.walk(root).forEach { p =>
      val rel = root.relativize(p).toString
      if (Files.isRegularFile(p) && !rel.startsWith("_graft") &&
        rel.endsWith(".parquet"))
        out(rel) = Files.getLastModifiedTime(p).toMillis
    }
    out.toMap
  }

  test("RENAME COLUMN is metadata-only: query by the new name (Scala + " +
    "SQL + time travel), zero file rewrites, old name gone") {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.t (day STRING, pk STRING, score BIGINT)
      PARTITIONED BY (day) TBLPROPERTIES ('keys'='pk', 'statsCols'='score')""")
    spark.sql(s"""INSERT INTO $cat.db.t (day, pk, score) VALUES
      ('d1', 'a', 10), ('d2', 'b', 20)""")
    val t = new GraftTable(spark, s"$root/db/t", keys = Seq("pk"),
      partitionCol = "day", statsCols = Seq("score"))
    val v0 = t.currentVersion
    val before = dataFilesWithMtimes(t.path)
    spark.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN score TO points")
    // zero rewrites, zero commits — pure metadata
    assert(dataFilesWithMtimes(t.path) == before,
      "RENAME COLUMN must not touch any data file")
    assert(t.currentVersion == v0)
    // SQL by the new name; old name is gone
    assert(spark.sql(s"SELECT pk, points FROM $cat.db.t")
      .as[(String, Long)].collect().toSet == Set("a" -> 10L, "b" -> 20L))
    intercept[Exception](spark.sql(s"SELECT score FROM $cat.db.t").collect())
    // Scala read + time travel surface the CURRENT name (the evolved-
    // schema semantics: history reads through the current schema)
    assert(t.read.columns.toSet == Set("day", "pk", "points"))
    assert(t.readAt(v0).select("points").as[Long].collect().toSet
      == Set(10L, 20L))
    // mutations keep working on the new name, incl. stats pruning (the
    // zone maps stay keyed by the PHYSICAL name under the rename)
    spark.sql(s"UPDATE $cat.db.t SET points = points + 1 WHERE points = 20")
    assert(spark.sql(s"SELECT points FROM $cat.db.t WHERE pk = 'b'")
      .as[Long].head() == 21L)
    assert(t.candidateFilesEquals("points", 10L).nonEmpty)
    // a filtered SQL scan by the new name still answers correctly
    assert(spark.sql(s"SELECT pk FROM $cat.db.t WHERE points >= 21")
      .as[String].collect().toSet == Set("b"))
  }

  test("DROP COLUMN is metadata-only and a re-added same name gets a " +
    "FRESH physical slot — dropped bytes never resurrect") {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.t (day STRING, pk STRING, v BIGINT,
        note STRING)
      PARTITIONED BY (day) TBLPROPERTIES ('keys'='pk')""")
    spark.sql(s"""INSERT INTO $cat.db.t (day, pk, v, note) VALUES
      ('d1', 'a', 1, 'secret'), ('d2', 'b', 2, 'hush')""")
    val t = new GraftTable(spark, s"$root/db/t", keys = Seq("pk"),
      partitionCol = "day")
    val before = dataFilesWithMtimes(t.path)
    spark.sql(s"ALTER TABLE $cat.db.t DROP COLUMN note")
    assert(dataFilesWithMtimes(t.path) == before,
      "DROP COLUMN must not touch any data file")
    assert(t.read.columns.toSet == Set("day", "pk", "v"))
    intercept[Exception](spark.sql(s"SELECT note FROM $cat.db.t").collect())
    // re-add the same logical name: fresh slot, old rows read NULL
    spark.sql(s"ALTER TABLE $cat.db.t ADD COLUMNS (note STRING)")
    val rows = spark.sql(s"SELECT pk, note FROM $cat.db.t").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    assert(rows == Map("a" -> null, "b" -> null),
      s"dropped bytes resurrected: $rows")
    // new writes carry the re-added column; old files stay untouched
    spark.sql(s"""INSERT INTO $cat.db.t (day, pk, v, note) VALUES
      ('d1', 'c', 3, 'fresh')""")
    assert(spark.sql(s"SELECT note FROM $cat.db.t WHERE pk = 'c'")
      .as[String].head() == "fresh")
    before.foreach { case (f, m) =>
      assert(dataFilesWithMtimes(t.path).get(f).contains(m),
        s"re-add rewrote pre-existing file $f")
    }
    // the physical slot is distinct — visible in the mapping
    val (m, h) = t.columnMap
    assert(h.contains("note"), "the dropped physical slot must be retired")
    assert(m.get("note").exists(_ != "note"),
      s"the re-added column must map to a fresh physical slot, got $m")
  }

  test("rename/drop guards: keys, the partition layout and CHECK-" +
    "referenced columns reject; name collisions reject; streams and " +
    "merges keep working after a rename") {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.t (day STRING, pk STRING, v BIGINT)
      PARTITIONED BY (day) TBLPROPERTIES ('keys'='pk')""")
    spark.sql(s"INSERT INTO $cat.db.t (day, pk, v) VALUES ('d1', 'a', 1)")
    val t = new GraftTable(spark, s"$root/db/t", keys = Seq("pk"),
      partitionCol = "day")
    intercept[Exception](spark.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN pk TO id"))
    intercept[Exception](spark.sql(s"ALTER TABLE $cat.db.t DROP COLUMN day"))
    intercept[Exception](spark.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN v TO pk"))
    spark.sql(s"ALTER TABLE $cat.db.t ADD CONSTRAINT posv CHECK (v >= 0)")
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.db.t RENAME COLUMN v TO w"))
    assert(e.getMessage.contains("posv"), e.getMessage)
    spark.sql(s"ALTER TABLE $cat.db.t DROP CONSTRAINT posv")
    spark.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN v TO w")
    // MERGE over the renamed column (the row-level SQL path reads the
    // logical schema)
    Seq(("d1", "a", 100L), ("d2", "z", 9L)).toDF("day", "pk", "w")
      .createOrReplaceTempView("cmap_src")
    spark.sql(s"""MERGE INTO $cat.db.t t USING cmap_src s ON t.pk = s.pk
      WHEN MATCHED THEN UPDATE SET w = s.w
      WHEN NOT MATCHED THEN INSERT (day, pk, w) VALUES (s.day, s.pk, s.w)""")
    assert(spark.sql(s"SELECT pk, w FROM $cat.db.t")
      .as[(String, Long)].collect().toSet == Set("a" -> 100L, "z" -> 9L))
    // the table streams under the mapping (snapshot drain, logical names)
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    val q = spark.readStream.table(s"$cat.db.t").writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft_cmap_ck").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("pk", "w").collect()
          .foreach(r => acc.add((r.getString(0), r.getLong(1)))); ()
      }.start()
    q.awaitTermination(60000)
    assert(!q.isActive)
    assert(scala.jdk.CollectionConverters.CollectionHasAsScala(acc)
      .asScala.toSet == Set("a" -> 100L, "z" -> 9L))
  }

  test("ALTER COLUMN TYPE widening is metadata-only: old INT files read " +
    "as BIGINT (filters + stats pruning exact), narrow INSERTs up-cast, " +
    "off-lattice and partition columns reject") {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.t (day STRING, pk STRING, v INT)
      PARTITIONED BY (day) TBLPROPERTIES ('keys'='pk', 'statsCols'='v')""")
    spark.sql(s"""INSERT INTO $cat.db.t (day, pk, v)
      SELECT 'd' || CAST(id % 2 AS STRING), 'p' || CAST(id AS STRING),
        CAST(id AS INT)
      FROM range(0, 50)""")
    val t = new GraftTable(spark, s"$root/db/t", keys = Seq("pk"),
      partitionCol = "day", statsCols = Seq("v"))
    val before = dataFilesWithMtimes(t.path)
    spark.sql(s"ALTER TABLE $cat.db.t ALTER COLUMN v TYPE BIGINT")
    assert(dataFilesWithMtimes(t.path) == before,
      "type widening must not touch any data file")
    assert(spark.table(s"$cat.db.t").schema("v").dataType
      == org.apache.spark.sql.types.LongType)
    // a pushed filter over the NARROW old files answers exactly
    assert(spark.sql(s"SELECT pk FROM $cat.db.t WHERE v = 7")
      .as[String].collect().toSeq == Seq("p7"))
    assert(spark.sql(s"SELECT sum(v) FROM $cat.db.t").as[Long].head()
      == (0L until 50L).sum)
    // stats pruning still keys off the same canon (integral 'l' tag)
    assert(t.candidateFilesEquals("v", 7L).size < t.dataFileCount,
      "widening broke zone-map pruning")
    // a mutation supplying the NARROWER type up-casts (conform lattice)
    t.append(Seq(("d1", "p100", 100)).toDF("day", "pk", "v"))
    assert(spark.sql(s"SELECT v FROM $cat.db.t WHERE pk = 'p100'")
      .as[Long].head() == 100L)
    // off-lattice and partition-layout widenings reject
    intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.db.t ALTER COLUMN v TYPE INT")) // narrowing
    intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.db.t ALTER COLUMN v TYPE STRING"))
    intercept[Exception](t.widenColumnType("day", org.apache.spark.sql
      .types.LongType))
    // compose with a rename: the widened, renamed column keeps working
    spark.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN v TO amount")
    assert(spark.sql(s"SELECT amount FROM $cat.db.t WHERE pk = 'p100'")
      .as[Long].head() == 100L)
  }

  test("deletion vectors + column mapping compose: a DV delete after a " +
    "rename subtracts exactly, through SQL and Scala") {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.t (day STRING, pk STRING, v BIGINT)
      PARTITIONED BY (day) TBLPROPERTIES ('keys'='pk', 'statsCols'='v')""")
    spark.sql(s"""INSERT INTO $cat.db.t (day, pk, v)
      SELECT 'd' || CAST(id % 2 AS STRING), 'p' || CAST(id AS STRING), id
      FROM range(0, 100)""")
    spark.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN v TO amount")
    // a predicate the V2 filter language cannot express (modulo):
    // the row-level strategy claims it (round 11) and it lands as the
    // same deletion-vector commit
    spark.sql(s"DELETE FROM $cat.db.t WHERE amount % 3 = 0")
    val t = new GraftTable(spark, s"$root/db/t", keys = Seq("pk"),
      partitionCol = "day", statsCols = Seq("v"))
    assert(t.hasDeletionVectorsAt(t.currentVersion),
      "a selective SQL DELETE must land as a deletion vector")
    val viaSql = spark.sql(s"SELECT amount FROM $cat.db.t")
      .as[Long].collect().toSet
    val expect = (0L until 100L).filterNot(_ % 3 == 0).toSet
    assert(viaSql == expect)
    assert(t.read.select("amount").as[Long].collect().toSet == expect)
  }
}
