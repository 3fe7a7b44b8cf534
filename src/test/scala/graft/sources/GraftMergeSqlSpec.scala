package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{GraftTable, GraftTableMeta}

/** SQL MERGE INTO / UPDATE over graft catalog tables
  * ([[org.apache.spark.sql.graft.GraftRowLevelSqlStrategy]]): statement
  * semantics equal the Scala clause ladder, untouched partitions keep
  * their files byte-for-byte, and every unsupported shape is rejected
  * loudly rather than half-applied.
  */
class GraftMergeSqlSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val root = Files.createTempDirectory("graft_msql").toString
    val cat = s"gmsql_${System.nanoTime()}_$n"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  /** Seeded keyed table: 2 rows in d1, 1 in d2, 1 in d3. */
  private def seed(root: String): GraftTable = {
    val t = new GraftTable(spark, s"$root/db/t", keys = Seq("pk"),
      partitionCol = "day")
    t.createIfNotExists(
      Seq.empty[(String, String, Long)].toDF("day", "pk", "n").schema)
    GraftTableMeta.annotate(t)
    t.importOnce(Seq(("d1", "a", 1L), ("d1", "x", 7L), ("d2", "b", 2L),
      ("d3", "z", 9L)).toDF("day", "pk", "n"))
    t
  }

  private def state(t: GraftTable): Map[String, Long] =
    t.read.select("pk", "n").as[(String, Long)].collect().toMap

  private def filesWithMtimes(dir: String): Map[String, Long] = {
    val root = Paths.get(dir)
    val out = scala.collection.mutable.Map.empty[String, Long]
    Files.walk(root).forEach { p =>
      val rel = root.relativize(p).toString
      if (Files.isRegularFile(p) && !rel.startsWith("_graft_log") &&
        !rel.startsWith("_graft_meta") && rel.endsWith(".parquet"))
        out(rel) = Files.getLastModifiedTime(p).toMillis
    }
    out.toMap
  }

  test("MERGE INTO: all four clause families in one statement; ordered " +
    "matched clauses; untouched partitions keep their files byte-for-byte") {
    val (cat, root) = freshCatalog()
    val t = seed(root)
    val before = filesWithMtimes(t.path)
    Seq(("d1", "a", 10L, "x"), ("d2", "b", 0L, "y"), ("d3", "c", 3L, "y"))
      .toDF("day", "pk", "n", "tag").createOrReplaceTempView("msql_src1")
    spark.sql(s"""MERGE INTO $cat.db.t t USING msql_src1 s ON t.pk = s.pk
      WHEN MATCHED AND s.n > t.n THEN UPDATE SET n = s.n
      WHEN MATCHED THEN DELETE
      WHEN NOT MATCHED AND s.tag = 'y' THEN
        INSERT (day, pk, n) VALUES (s.day, s.pk, s.n)
      WHEN NOT MATCHED BY SOURCE AND t.n = 9 THEN UPDATE SET n = t.n * 100""")
    // a→10 (first matched clause), b deleted (second), c inserted
    // (conditional), x untouched (no by-source clause claims n=7),
    // z→900 (by-source)
    assert(state(t) == Map("a" -> 10L, "c" -> 3L, "x" -> 7L, "z" -> 900L))
    // d1, d2, d3 all rewrote (a updated / b deleted / z by-source);
    // c landed in d3. The merge is ONE commit.
    val after = filesWithMtimes(t.path)
    val untouched = before.filter { case (f, _) => after.get(f).contains(before(f)) }
    assert(untouched.nonEmpty, "history files must survive (manifest versioning)")
  }

  test("MERGE INTO: insert-only merge appends without touching ANY " +
    "existing file (byte-for-byte)") {
    val (cat, root) = freshCatalog()
    val t = seed(root)
    val before = filesWithMtimes(t.path)
    Seq(("d1", "new1", 100L), ("d9", "new2", 200L)).toDF("day", "pk", "n")
      .createOrReplaceTempView("msql_src2")
    spark.sql(s"""MERGE INTO $cat.db.t t USING msql_src2 s ON t.pk = s.pk
      WHEN NOT MATCHED THEN INSERT (day, pk, n) VALUES (s.day, s.pk, s.n)""")
    assert(state(t) == Map("a" -> 1L, "x" -> 7L, "b" -> 2L, "z" -> 9L,
      "new1" -> 100L, "new2" -> 200L))
    val after = filesWithMtimes(t.path)
    before.foreach { case (f, mtime) =>
      assert(after.get(f).contains(mtime),
        s"insert-only merge rewrote pre-existing file $f")
    }
    assert(after.size > before.size, "the insert must land as NEW files")
  }

  test("MERGE INTO: multiple WHEN NOT MATCHED INSERT clauses compose " +
    "first-hit-wins; ON may map a key through a source expression") {
    val (cat, root) = freshCatalog()
    val t = seed(root)
    // the source has no column named pk — the ON derives it
    Seq(("d5", "A", 50L, "hot"), ("d5", "Q", 60L, "cold"), ("d5", "R", 70L, "neither"))
      .toDF("day", "ext_id", "n", "temp").createOrReplaceTempView("msql_src3")
    spark.sql(s"""MERGE INTO $cat.db.t t USING msql_src3 s
      ON t.pk = lower(s.ext_id)
      WHEN MATCHED THEN UPDATE SET n = s.n
      WHEN NOT MATCHED AND s.temp = 'hot' THEN
        INSERT (day, pk, n) VALUES (s.day, lower(s.ext_id), s.n)
      WHEN NOT MATCHED AND s.temp = 'cold' THEN
        INSERT (day, pk, n) VALUES (s.day, lower(s.ext_id), s.n + 1000)""")
    // A matches a (lower) → update; Q is cold → second insert clause
    // (+1000); R matches neither insert condition → not inserted
    assert(state(t) == Map("a" -> 50L, "x" -> 7L, "b" -> 2L, "z" -> 9L,
      "q" -> 1060L))
  }

  test("MERGE INTO: unsupported shapes are rejected loudly, the table " +
    "unchanged — non-key ON, extra ON conjunct, time-travel target") {
    val (cat, root) = freshCatalog()
    val t = seed(root)
    val v = t.currentVersion
    Seq(("d1", "a", 10L)).toDF("day", "pk", "n")
      .createOrReplaceTempView("msql_src4")
    // ON over a non-key column
    val e1 = intercept[Exception] {
      spark.sql(s"""MERGE INTO $cat.db.t t USING msql_src4 s ON t.n = s.n
        WHEN MATCHED THEN UPDATE SET n = s.n""")
    }
    assert(e1.getMessage.contains("table keys"), e1.getMessage)
    // a key equated twice (constant + the real source key) must reject
    // — first-conjunct-wins would silently JOIN ON THE CONSTANT and
    // demote the real equality to a residual (order-dependent)
    val e4 = intercept[Exception] {
      spark.sql(s"""MERGE INTO $cat.db.t t USING msql_src4 s
        ON t.pk = 'a' AND t.pk = s.pk
        WHEN MATCHED THEN UPDATE SET n = s.n""")
    }
    assert(e4.getMessage.contains("twice"), e4.getMessage)
    // time-travel target
    val e3 = intercept[Exception] {
      spark.sql(s"""MERGE INTO $cat.db.t VERSION AS OF 1 t USING msql_src4 s
        ON t.pk = s.pk WHEN MATCHED THEN UPDATE SET n = s.n""")
    }
    assert(e3.getMessage.contains("time-travel") ||
      e3.getMessage.contains("VERSION"), e3.getMessage)
    assert(t.currentVersion == v, "a rejected merge must not commit")
    assert(state(t) == Map("a" -> 1L, "x" -> 7L, "b" -> 2L, "z" -> 9L))
  }

  test("UPDATE: predicate update rewrites only touched partitions; " +
    "no-match commits nothing; partition-moving SET relocates rows") {
    val (cat, root) = freshCatalog()
    val t = seed(root)
    val before = filesWithMtimes(t.path)
    val v0 = t.currentVersion
    spark.sql(s"UPDATE $cat.db.t SET n = n * 10 WHERE day = 'd2'")
    assert(state(t) == Map("a" -> 1L, "x" -> 7L, "b" -> 20L, "z" -> 9L))
    val after = filesWithMtimes(t.path)
    before.filter(_._1.startsWith("day=d1")).foreach { case (f, m) =>
      assert(after.get(f).contains(m), s"UPDATE on d2 rewrote d1 file $f")
    }
    before.filter(_._1.startsWith("day=d3")).foreach { case (f, m) =>
      assert(after.get(f).contains(m), s"UPDATE on d2 rewrote d3 file $f")
    }
    // no-match → no commit
    val v1 = t.currentVersion
    spark.sql(s"UPDATE $cat.db.t SET n = 0 WHERE pk = 'nope'")
    assert(t.currentVersion == v1, "a no-match UPDATE must not commit")
    // partition move: z relocates from d3 to d9
    spark.sql(s"UPDATE $cat.db.t SET day = 'd9' WHERE pk = 'z'")
    assert(t.read.filter($"pk" === "z").select("day").as[String].collect()
      .toSeq == Seq("d9"))
    assert(t.read.filter($"day" === "d3").count() == 0)
    // time travel intact across all three statements
    assert(t.readAt(v0).filter($"pk" === "b").select("n").as[Long]
      .collect().toSeq == Seq(2L))
  }

  test("MERGE INTO: composite ON classifies ANSI-true — a residual-" +
    "failing key match is NOT matched: target row untouched (files " +
    "byte-for-byte), source row INSERTED") {
    val (cat, root) = freshCatalog()
    val t = seed(root) // a:1@d1, x:7@d1, b:2@d2, z:9@d3
    val before = filesWithMtimes(t.path)
    Seq(("d1", "a", 100L), ("d2", "b", 200L), ("d9", "new", 5L))
      .toDF("day", "pk", "n").createOrReplaceTempView("msql_res")
    spark.sql(s"""MERGE INTO $cat.db.t t USING msql_res s
      ON t.pk = s.pk AND t.n > 1
      WHEN MATCHED THEN UPDATE SET n = s.n
      WHEN NOT MATCHED THEN INSERT (day, pk, n) VALUES (s.day, s.pk, s.n)""")
    // Row-by-row contrast with the pre-round-11 FOLD semantics:
    //   row                      old (fold)          new (ANSI, Delta)
    //   a: key match, residual   no action; source   target KEPT and source
    //      FAILS (n=1, not >1)   row dropped         row INSERTED (dup key —
    //                                                the user's explicit ON)
    //   b: residual holds (n=2)  update → 200        update → 200
    //   x, z: no key match       kept                kept
    //   new: no key match        inserted            inserted
    val rows = t.read.select("pk", "n").as[(String, Long)].collect().toSeq.sorted
    assert(rows == Seq(("a", 1L), ("a", 100L), ("b", 200L), ("new", 5L),
      ("x", 7L), ("z", 9L)).sorted)
    // the residual-failing match is NOT matched: d1's pre-merge files
    // stay byte-for-byte (the a-insert lands as a NEW d1 file); d3 is
    // unclaimed entirely
    val after = filesWithMtimes(t.path)
    before.filter { case (f, _) =>
      f.startsWith("day=d1") || f.startsWith("day=d3") }.foreach { case (f, m) =>
      assert(after.get(f).contains(m),
        s"residual merge rewrote an unclaimed partition file $f")
    }
  }

  test("MERGE INTO: composite ON + WHEN NOT MATCHED BY SOURCE — a " +
    "residual-failing key match IS a by-source candidate (ANSI)") {
    val (cat, root) = freshCatalog()
    val t = seed(root) // a:1@d1, x:7@d1, b:2@d2, z:9@d3
    Seq(("d1", "a", 100L), ("d2", "b", 200L)).toDF("day", "pk", "n")
      .createOrReplaceTempView("msql_resnmbs")
    spark.sql(s"""MERGE INTO $cat.db.t t USING msql_resnmbs s
      ON t.pk = s.pk AND t.n > 1
      WHEN MATCHED THEN UPDATE SET n = s.n
      WHEN NOT MATCHED BY SOURCE AND t.n < 8 THEN UPDATE SET n = t.n * -1""")
    // a: key match but residual fails (n=1) → not matched BY SOURCE → -1
    // b: residual holds → 200; x (n=7): unmatched → -7;
    // z (n=9): unmatched but the by-source condition fails → kept
    assert(state(t) == Map("a" -> -1L, "b" -> 200L, "x" -> -7L, "z" -> 9L))
  }

  test("DELETE FROM with an IN subquery plans through the row-level " +
    "strategy: deletion-vector commit, distributed semi-join, residual " +
    "conjuncts honored; correlated NOT EXISTS anti-joins; scalar " +
    "subqueries reject loudly") {
    val (cat, root) = freshCatalog()
    val t = seed(root)
    Seq("a", "z", "nope").toDF("k").createOrReplaceTempView("msql_delkeys")
    spark.sql(s"DELETE FROM $cat.db.t WHERE pk IN " +
      "(SELECT k FROM msql_delkeys) AND n < 9")
    // a (n=1, in set) deleted; z (n=9) kept by the residual; b/x not in set
    assert(state(t) == Map("x" -> 7L, "b" -> 2L, "z" -> 9L))
    // the commit is an O(matched) deletion vector, not a rewrite
    assert(t.hasDeletionVectorsAt(t.currentVersion),
      "a subquery DELETE must land as a deletion-vector commit")
    // correlated NOT EXISTS (round 11): a distributed hash ANTI join on
    // the pulled-up correlation equality — x and b have no key entry
    spark.sql(s"DELETE FROM $cat.db.t t WHERE NOT EXISTS " +
      "(SELECT 1 FROM msql_delkeys d WHERE d.k = t.pk)")
    assert(state(t) == Map("z" -> 9L))
    // scalar subqueries still reject loudly, nothing commits
    val v = t.currentVersion
    val e1 = intercept[Exception](spark.sql(
      s"DELETE FROM $cat.db.t WHERE n = (SELECT max(n) FROM $cat.db.t)"))
    assert(e1.getMessage.toLowerCase.contains("subquer"), e1.getMessage)
    // a USER-written scalar null test must NOT be misread as the
    // optimizer's uncorrelated-EXISTS probe (same IsNull(ScalarSubquery)
    // surface, entirely different semantics — the shape check guards it)
    val e2 = intercept[Exception](spark.sql(
      s"DELETE FROM $cat.db.t WHERE (SELECT max(k) FROM msql_delkeys) IS NULL"))
    assert(e2.getMessage.toLowerCase.contains("subquer"), e2.getMessage)
    assert(t.currentVersion == v, "a rejected DELETE must not commit")
  }

  test("DELETE FROM with NOT IN: exact SQL three-valued semantics — a " +
    "null member keeps every row (no commit), a null probe value never " +
    "matches, an empty subquery matches ALL rows") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.nt (day STRING, pk STRING, v BIGINT)
      PARTITIONED BY (day) TBLPROPERTIES ('keys'='pk')""")
    spark.sql(s"""INSERT INTO $cat.db.nt (day, pk, v) VALUES
      ('d1', 'a', 1), ('d1', 'b', CAST(NULL AS BIGINT)), ('d2', 'c', 3)""")
    Seq(Some(1L), None).toDF("x").createOrReplaceTempView("msql_ninull")
    Seq(1L).toDF("x").createOrReplaceTempView("msql_nione")
    spark.sql("SELECT CAST(1 AS BIGINT) AS x WHERE 1 = 0")
      .createOrReplaceTempView("msql_niempty")
    def rows() = spark.sql(s"SELECT pk FROM $cat.db.nt")
      .as[String].collect().toSet
    // a NULL member: `v NOT IN (…)` is never TRUE — nothing deletes,
    // nothing commits
    spark.sql(s"DELETE FROM $cat.db.nt WHERE v NOT IN (SELECT x FROM msql_ninull)")
    assert(rows() == Set("a", "b", "c"))
    // plain set [1]: c (v=3) deletes; a (v=1) is IN; b's NULL probe
    // never satisfies NOT IN
    spark.sql(s"DELETE FROM $cat.db.nt WHERE v NOT IN (SELECT x FROM msql_nione)")
    assert(rows() == Set("a", "b"))
    // empty subquery: NOT IN (empty) is TRUE for every row, null probe
    // included
    spark.sql(s"DELETE FROM $cat.db.nt WHERE v NOT IN (SELECT x FROM msql_niempty)")
    assert(rows() == Set.empty[String])
  }

  test("DELETE FROM with correlated NOT IN: per-group three-valued " +
    "semantics through one hash anti-join — empty group qualifies, a " +
    "null member or a value hit does not") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.cn (day STRING, pk STRING, v BIGINT)
      PARTITIONED BY (day) TBLPROPERTIES ('keys'='pk')""")
    spark.sql(s"""INSERT INTO $cat.db.cn (day, pk, v) VALUES
      ('d1', 'a', 1), ('d1', 'b', 2), ('d2', 'c', CAST(NULL AS BIGINT)),
      ('d2', 'd', 7)""")
    Seq(("a", Some(1L)), ("b", Some(99L)), ("b", None), ("d", Some(5L)))
      .toDF("k", "x").createOrReplaceTempView("msql_cnin")
    spark.sql(s"DELETE FROM $cat.db.cn t WHERE t.v NOT IN " +
      "(SELECT x FROM msql_cnin s WHERE s.k = t.pk)")
    // a: group [1], v=1 is IN → kept; b: group [99, null] has a null
    // member → kept; c: group EMPTY → NOT IN (empty) = TRUE even for a
    // null probe → deleted; d: group [5], v=7 ∉ and no nulls → deleted
    assert(spark.sql(s"SELECT pk FROM $cat.db.cn").as[String].collect()
      .toSet == Set("a", "b"))
  }

  test("UPDATE with NOT IN / correlated EXISTS / uncorrelated EXISTS: " +
    "1:1 marker joins with SQL null semantics; duplicated subquery " +
    "values never duplicate target rows") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.db.un (day STRING, pk STRING, v BIGINT)
      PARTITIONED BY (day) TBLPROPERTIES ('keys'='pk')""")
    spark.sql(s"""INSERT INTO $cat.db.un (day, pk, v) VALUES
      ('d1', 'a', 1), ('d1', 'b', CAST(NULL AS BIGINT)), ('d2', 'c', 3)""")
    def state2() = spark.sql(s"SELECT pk, v FROM $cat.db.un")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // duplicated subquery values: the DISTINCT marker join keeps 1:1
    Seq(1L, 1L, 3L).toDF("x").createOrReplaceTempView("msql_updup")
    spark.sql(s"UPDATE $cat.db.un SET v = v + 100 WHERE v IN " +
      "(SELECT x FROM msql_updup)")
    assert(state2() == Map("a" -> Some(101L), "b" -> None, "c" -> Some(103L)))
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.un").head.getLong(0) == 3L,
      "a duplicated subquery value duplicated target rows")
    // NOT IN with set [101]: c qualifies (103 ∉), b's null probe does not
    Seq(101L).toDF("x").createOrReplaceTempView("msql_upni")
    spark.sql(s"UPDATE $cat.db.un SET v = 0 WHERE v NOT IN " +
      "(SELECT x FROM msql_upni)")
    assert(state2() == Map("a" -> Some(101L), "b" -> None, "c" -> Some(0L)))
    // correlated EXISTS: only pk 'b' has a witness row
    Seq("b").toDF("k").createOrReplaceTempView("msql_upex")
    spark.sql(s"UPDATE $cat.db.un t SET v = -1 WHERE EXISTS " +
      "(SELECT 1 FROM msql_upex s WHERE s.k = t.pk)")
    assert(state2() == Map("a" -> Some(101L), "b" -> Some(-1L), "c" -> Some(0L)))
    // uncorrelated NOT EXISTS over a non-empty subquery: no row
    // qualifies, nothing commits
    val t = new GraftTable(spark, spark.conf.get(s"spark.sql.catalog.$cat.root")
      + "/db/un", keys = Seq("pk"), partitionCol = "day")
    val v0 = t.currentVersion
    spark.sql(s"UPDATE $cat.db.un SET v = 9 WHERE NOT EXISTS " +
      "(SELECT 1 FROM msql_upex)")
    assert(t.currentVersion == v0, "a no-match UPDATE must not commit")
    assert(state2() == Map("a" -> Some(101L), "b" -> Some(-1L), "c" -> Some(0L)))
  }

  test("UPDATE with an IN subquery constrains matched rows via a " +
    "distributed membership join; untouched partitions keep their files") {
    val (cat, root) = freshCatalog()
    val t = seed(root)
    val before = filesWithMtimes(t.path)
    Seq("a", "b").toDF("k").createOrReplaceTempView("msql_updkeys")
    spark.sql(s"UPDATE $cat.db.t SET n = n + 100 WHERE pk IN " +
      "(SELECT k FROM msql_updkeys) AND n < 2")
    // a (n=1, in set): updated; b (n=2): residual fails; x/z: not in set
    assert(state(t) == Map("a" -> 101L, "x" -> 7L, "b" -> 2L, "z" -> 9L))
    val after = filesWithMtimes(t.path)
    before.filter { case (f, _) =>
      f.startsWith("day=d2") || f.startsWith("day=d3") }.foreach { case (f, m) =>
      assert(after.get(f).contains(m), s"subquery UPDATE rewrote untouched $f")
    }
  }

  test("Scala merge API: notMatchedBySource clauses fire in order on " +
    "unmatched target rows only; source refs stay out") {
    val dir = Files.createTempDirectory("graft_nmbs").toString + "/t"
    val t = new GraftTable(spark, dir, keys = Seq("pk"), partitionCol = "day")
    t.createIfNotExists(
      Seq.empty[(String, String, Long)].toDF("day", "pk", "n").schema)
    t.importOnce(Seq(("d1", "a", 1L), ("d1", "b", 2L), ("d2", "c", 3L),
      ("d3", "d", 4L)).toDF("day", "pk", "n"))
    val src = Seq(("d1", "a", 100L)).toDF("day", "pk", "n")
    t.merge(src,
      matched = Seq(GraftTable.MatchedUpdate(lit(true),
        Map("n" -> GraftTable.src("n")))),
      notMatchedBySource = Seq(
        GraftTable.MatchedDelete(col("n") === 2L),      // b deleted
        GraftTable.MatchedUpdate(col("n") === 2L,       // shadowed by the delete
          Map("n" -> lit(-1L))),
        GraftTable.MatchedUpdate(col("n") > 2L,         // c, d
          Map("n" -> (col("n") + 1000L)))))
    assert(state(t) == Map("a" -> 100L, "c" -> 1003L, "d" -> 1004L))
  }

  test("Scala merge API: notMatchedBySource assignments referencing " +
    "src() reject up front (they would silently assign null)") {
    val dir = Files.createTempDirectory("graft_nmbs3").toString + "/t"
    val t = new GraftTable(spark, dir, keys = Seq("pk"), partitionCol = "day")
    t.createIfNotExists(
      Seq.empty[(String, String, Long)].toDF("day", "pk", "n").schema)
    t.importOnce(Seq(("d1", "a", 1L), ("d2", "b", 2L)).toDF("day", "pk", "n"))
    val src = Seq(("d1", "a", 100L)).toDF("day", "pk", "n")
    val e = intercept[IllegalArgumentException] {
      t.merge(src, matched = Nil,
        notMatchedBySource = Seq(GraftTable.MatchedUpdate(lit(true),
          Map("n" -> GraftTable.src("n")))))
    }
    assert(e.getMessage.contains("TARGET columns only"), e.getMessage)
    assert(state(t) == Map("a" -> 1L, "b" -> 2L), "a rejected merge mutated")
  }

  test("Scala merge API: notMatchedBySource alone (no matched clause) " +
    "touches only the partitions a clause claims") {
    val dir = Files.createTempDirectory("graft_nmbs2").toString + "/t"
    val t = new GraftTable(spark, dir, keys = Seq("pk"), partitionCol = "day")
    t.createIfNotExists(
      Seq.empty[(String, String, Long)].toDF("day", "pk", "n").schema)
    t.importOnce(Seq(("d1", "a", 1L), ("d2", "b", 2L), ("d3", "c", 3L))
      .toDF("day", "pk", "n"))
    val before = filesWithMtimes(t.path)
    // source matches `a`, so `a` is NOT "not matched by source"; only
    // d3 (n=3) is claimed — d1 AND d2 files must stay byte-for-byte
    val src = Seq(("d1", "a", 0L)).toDF("day", "pk", "n")
    t.merge(src, matched = Nil,
      notMatchedBySource = Seq(GraftTable.MatchedUpdate(col("n") === 3L,
        Map("n" -> lit(33L)))))
    assert(state(t) == Map("a" -> 1L, "b" -> 2L, "c" -> 33L))
    val after = filesWithMtimes(t.path)
    before.filterNot(_._1.startsWith("day=d3")).foreach { case (f, m) =>
      assert(after.get(f).contains(m),
        s"by-source merge rewrote unclaimed partition file $f")
    }
  }
}
