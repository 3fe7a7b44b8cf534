package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Round-14 regression tests for the round-13 ADVICE findings:
  *
  *   1. the atomic-CREATE pointer gate really is atomic: on POSIX,
  *      `Files.move(…, ATOMIC_MOVE)` maps to rename(2) which silently
  *      REPLACES an existing target, so the old FileAlreadyExists
  *      catch was dead code — the pointer now publishes via hard-link
  *      creation (link(2) → EEXIST), and exactly one of two racers
  *      wins;
  *   2. `count(col)` over a NON-INTEGRAL column in a SELECT-defined
  *      mview registers the count-only `cnt:` state family (plain
  *      addition on fold) instead of a `_sum_` partial whose
  *      `CAST(col AS DECIMAL)` would break ANSI sessions;
  *   3. (the `Files.walk` fd leak in the vacuum generation sweep is a
  *      resource fix — covered by the existing vacuum specs running
  *      leak-free.)
  */
class GraftR14AdviceSpec extends SparkSpec {

  test("publishPointerIfAbsent: the second publisher of the same " +
    "target LOSES (no silent rename-replace)") {
    val dir = Files.createTempDirectory("graft_r14_ptr")
    val target = dir.resolve("_graft_ptr")
    def tmpWith(content: String) = {
      val t = dir.resolve(s".tmp_${content}")
      Files.writeString(t, content)
      t
    }
    assert(GraftCatalog.publishPointerIfAbsent(tmpWith("gen_A"), target))
    assert(Files.readString(target) == "gen_A")
    // the loser must NOT clobber the winner's pointer
    assert(!GraftCatalog.publishPointerIfAbsent(tmpWith("gen_B"), target))
    assert(Files.readString(target) == "gen_A",
      "rename-replace semantics would have silently clobbered gen_A")
    // both tmp files are consumed either way
    assert(java.util.Optional.ofNullable(dir.toFile.listFiles()).get()
      .map(_.getName).toSet == Set("_graft_ptr"))
  }

  test("racing atomic CREATE TABLE AS SELECT: exactly one wins " +
    "end-to-end, the loser errors loudly") {
    val root = Files.createTempDirectory("graft_r14_race").toString
    val cat = s"r14r_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = (1 to 2).map { i =>
      Future {
        try {
          spark.sql(s"""CREATE TABLE $cat.db.raced
            TBLPROPERTIES ('keys'='id')
            AS SELECT id, $i AS src FROM range(100)""")
          Right(i)
        } catch { case e: Throwable => Left(e) }
      }
    }.map(Await.result(_, 120.seconds))
    val winners = results.collect { case Right(i) => i }
    assert(winners.size == 1, s"expected exactly one winner, got $results")
    // the surviving table is EXACTLY the winner's content
    val srcs = spark.sql(s"SELECT DISTINCT src FROM $cat.db.raced")
      .collect().map(_.getInt(0)).toSeq
    assert(srcs == Seq(winners.head), s"winner ${winners.head}, table $srcs")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.raced")
      .collect()(0).getLong(0) == 100L)
  }

  test("count(string col) in a SELECT-defined mview: the count-only " +
    "family folds through both modes (no decimal cast of a string)") {
    val root = Files.createTempDirectory("graft_r14_cnt").toString
    val cat = s"r14c_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"""CREATE TABLE $cat.db.ev (k BIGINT, g BIGINT, tag STRING)
      TBLPROPERTIES ('keys'='k')""")
    spark.sql(s"""INSERT INTO $cat.db.ev
      SELECT id, id % 4,
        CASE WHEN id % 3 = 0 THEN NULL
             ELSE concat('t', CAST(id AS STRING)) END
      FROM range(40)""")
    spark.sql(s"""CALL $cat.system.create_mview_sql('db.tags', sql =>
      "SELECT g, count(tag) AS tagged, count(*) AS n
       FROM $cat.db.ev GROUP BY g")""")
    def want = spark.sql(s"""SELECT g, count(tag) AS tagged, count(*) AS n
        FROM $cat.db.ev GROUP BY g""").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def got = spark.sql(s"SELECT g, tagged, n FROM $cat.db.tags")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    spark.sql(s"""INSERT INTO $cat.db.ev
      SELECT id, id % 4,
        CASE WHEN id % 5 = 0 THEN NULL
             ELSE concat('t', CAST(id AS STRING)) END
      FROM range(40, 70)""")
    val r1 = spark.sql(s"CALL $cat.system.refresh_mview('db.tags')")
      .collect()(0)
    assert(r1.getString(1) == "incremental", r1.toString)
    assert(got == want)
    spark.sql(s"DELETE FROM $cat.db.ev WHERE k % 11 = 0")
    val r2 = spark.sql(s"CALL $cat.system.refresh_mview('db.tags')")
      .collect()(0)
    assert(r2.getString(1) == "full", r2.toString)
    assert(got == want)
    // the count state also folds on an ANSI session-style strict read:
    // no decimal cast of the string column exists anywhere in the state
    val stateCols = spark.sql(s"SELECT * FROM $cat.db.tags_state").columns
    assert(stateCols.exists(_.startsWith("_cn_")) &&
      !stateCols.exists(_.startsWith("_sum_")), stateCols.mkString(", "))
  }
}
