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
    // a non-key residual combined with NOT MATCHED BY SOURCE would
    // silently misclassify under the fold — rejected
    val e2 = intercept[Exception] {
      spark.sql(s"""MERGE INTO $cat.db.t t USING msql_src4 s
        ON t.pk = s.pk AND t.n > 0
        WHEN MATCHED THEN UPDATE SET n = s.n
        WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    }
    assert(e2.getMessage.contains("BY SOURCE"), e2.getMessage)
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

  test("MERGE INTO: a non-key ON residual folds into the matched " +
    "clauses — residual-failing key matches take no action and their " +
    "partitions keep their files byte-for-byte; inserts stay key-based") {
    val (cat, root) = freshCatalog()
    val t = seed(root) // a:1@d1, x:7@d1, b:2@d2, z:9@d3
    val before = filesWithMtimes(t.path)
    Seq(("d1", "a", 100L), ("d2", "b", 200L), ("d9", "new", 5L))
      .toDF("day", "pk", "n").createOrReplaceTempView("msql_res")
    spark.sql(s"""MERGE INTO $cat.db.t t USING msql_res s
      ON t.pk = s.pk AND t.n > 1
      WHEN MATCHED THEN UPDATE SET n = s.n
      WHEN NOT MATCHED THEN INSERT (day, pk, n) VALUES (s.day, s.pk, s.n)""")
    // a key-matches but fails the residual (n=1): untouched, and NOT
    // re-inserted (the documented ANSI caveat — inserts stay key-based);
    // b (n=2) passes → 200; 'new' has no key match → inserted
    assert(state(t) == Map("a" -> 1L, "x" -> 7L, "b" -> 200L, "z" -> 9L,
      "new" -> 5L))
    // d1 (residual-failing match) and d3 (unclaimed) keep their files
    val after = filesWithMtimes(t.path)
    before.filter { case (f, _) =>
      f.startsWith("day=d1") || f.startsWith("day=d3") }.foreach { case (f, m) =>
      assert(after.get(f).contains(m),
        s"residual merge rewrote an unclaimed partition file $f")
    }
  }

  test("DELETE FROM with an IN subquery plans through the row-level " +
    "strategy: deletion-vector commit, distributed semi-join, residual " +
    "conjuncts honored; unsupported subquery shapes reject loudly") {
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
    // NOT IN and correlated EXISTS reject loudly, nothing commits
    val v = t.currentVersion
    val e1 = intercept[Exception](spark.sql(
      s"DELETE FROM $cat.db.t WHERE pk NOT IN (SELECT k FROM msql_delkeys)"))
    assert(e1.getMessage.toLowerCase.contains("subquer"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      s"DELETE FROM $cat.db.t WHERE EXISTS " +
        "(SELECT 1 FROM msql_delkeys d WHERE d.k = pk)"))
    assert(e2.getMessage.toLowerCase.contains("subquer"), e2.getMessage)
    assert(t.currentVersion == v, "a rejected DELETE must not commit")
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
