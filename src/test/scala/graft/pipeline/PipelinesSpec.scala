package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pipeline-level golden tests on reference-shaped fixtures
  * (FIXTURES.md §A): E1 EPG import, E2 top refinement, E3 torrent match.
  */
class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  private val recCols = Seq("PartitionKey", "RowKey", "Id", "beginn", "dauer",
    "sender", "titel", "genre_id", "genre", "language")

  private def emptyRecordings = Seq.empty[(String, String, Int, Timestamp, Int,
    String, String, Int, String, String)]
    .toDF(recCols: _*)

  private def epgCsv = Seq(
    // Id, beginn, dauer, sender, titel, genre_id, language
    ("101", "05.03.2021 20:15:00", "90", "Das Erste", "Tatort", "1", "de"),
    ("102", "05.03.2021 21:45:00", "45", "ZDF", "heute", "2", "de"),
    ("103", "garbage-date", "30", "RTL", "Show", "99", "de"),   // bad date → epoch, unknown genre → Sonstiges
    ("104", "05.03.2021 22:00:00", "60", "BBC", "News", "1", "en") // filtered: not 'de'
  ).toDF("Id", "beginn", "dauer", "sender", "titel", "genre_id", "language")
    .withColumn("ende", lit("05.03.2021 23:00:00"))

  private def genres = Seq((1, "Spielfilm"), (2, "Nachrichten")).toDF("Genre_Id", "Genre")

  test("E1 epgImport: de-filter, key derivation, genre default, safe dates") {
    val out = Pipelines.epgImport(epgCsv, genres, emptyRecordings)
    val rows = out.select("RowKey", "PartitionKey", "genre", "beginn")
      .as[(String, String, String, Timestamp)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4.toString)).toMap
    assert(rows.size == 3) // the 'en' row is gone
    assert(rows("101") == ("2021_03_05", "Spielfilm", "2021-03-05 20:15:00.0"))
    assert(rows("102")._2 == "Nachrichten")
    // bad date → epoch default 1900, which also becomes the partition key
    assert(rows("103") == ("1900_01_01", "Sonstiges", "1900-01-01 00:00:00.0"))
  }

  test("E1 epgImport is idempotent under re-import (U2/U3)") {
    val once = Pipelines.epgImport(epgCsv, genres, emptyRecordings)
    val twice = Pipelines.epgImport(epgCsv, genres, once)
    assert(twice.count() == once.count())
    assert(twice.exceptAll(once).isEmpty)
  }

  test("E2 topRecordings: rating threshold + existence semi-join + re-key to 'top'") {
    val recordings = Pipelines.epgImport(epgCsv, genres, emptyRecordings)
    val toplist = Seq(
      ("2021_03_05", "101", "sehr hoch"),
      ("2021_03_05", "102", "mittel"),   // rating below threshold
      ("2021_03_05", "999", "hoch")      // no such recording
    ).toDF("PartitionKey", "RowKey", "rating")
    val top = emptyRecordings
    val out = Pipelines.topRecordings(toplist, recordings, top)
    val keys = out.select("PartitionKey", "RowKey").as[(String, String)].collect().toSeq
    assert(keys == Seq(("top", "101")))
    // idempotent: inserting again adds nothing
    val again = Pipelines.topRecordings(toplist, recordings, out)
    assert(again.count() == 1)
  }

  test("E3 torrentMatch: derived-key join, 1:N variants, anti-join delete") {
    val ts = Timestamp.valueOf("2021-03-05 20:15:00")
    val tops = Seq(
      (101, ts, "Das Erste"),
      (202, Timestamp.valueOf("2021-03-06 10:00:00"), "ZDF") // no torrents → dropped
    ).toDF("Id", "beginn", "sender")
    val tracker = Seq(
      (ts, "daserste", "HD", 5),
      (ts, "daserste", "AVI", 9),                                // second variant, same recording
      (Timestamp.valueOf("2021-02-01 10:00:00"), "daserste", "HD", 1) // outside 8-day window
    ).toDF("beginn", "sender", "Resolution", "finished")
    val (matched, surviving) = Pipelines.torrentMatch(
      tracker, tops, Timestamp.valueOf("2021-03-01 00:00:00"))
    val m = matched.select("PartitionKey", "RowKey").as[(String, String)].collect().toSet
    assert(m == Set(("101", "HD"), ("101", "AVI")))
    assert(surviving.select("Id").as[Int].collect().toSeq == Seq(101))
  }

  test("E3 cascadeDelete: zero-torrent top + its stale torrents → delete keys (etl.py:257-259)") {
    val tops = Seq(("top", "101"), ("top", "202"), ("top", "303"))
      .toDF("PartitionKey", "RowKey")
    val surviving = Seq(("top", "101")).toDF("PartitionKey", "RowKey")
    val storedTorrents = Seq(
      ("101", "HD"),   // parent survives → kept
      ("202", "HD"),   // parent doomed → cascade
      ("202", "AVI"),  // both variants cascade
      ("999", "HD")    // orphan of a never-top recording → untouched here
    ).toDF("PartitionKey", "RowKey")
    val (dTops, dTorr) = Pipelines.cascadeDelete(tops, surviving, storedTorrents)
    assert(dTops.as[(String, String)].collect().toSet
      == Set(("top", "202"), ("top", "303")))
    assert(dTorr.as[(String, String)].collect().toSet
      == Set(("202", "HD"), ("202", "AVI")))
  }

  test("full tick over fixtures is idempotent and cascades the torrentless top") {
    val base = java.nio.file.Files.createTempDirectory("graft_run").toString
    def state() = {
      // read through the table API: a versioned GraftTable's directory
      // also holds HISTORY files (time travel) — a raw directory read
      // is not the table
      def tbl(name: String) = new graft.operators.GraftTable(spark,
        s"$base/$name", Seq("PartitionKey", "RowKey"), "PartitionKey").read
      val (g, r, t, z) = (tbl("genres"), tbl("recordings"),
        tbl("top"), tbl("torrents"))
      (g.count(),
        r.select("PartitionKey", "RowKey").as[(String, String)].collect().toSet,
        t.select("RowKey").as[String].collect().toSet,
        z.select("PartitionKey", "RowKey").as[(String, String)].collect().toSet)
    }
    Run.tick(spark, base)
    val first = state()
    // E1: de-rows only — 4 on day 05 (incl. bad-date→1900 partition? no:
    // 1004's epoch partition, and the non-numeric-Id row) + 2 on day 06
    assert(first._2.map(_._2) == Set("1001", "1002", "1004", "0", "1005", "1006"))
    // E2+E3: 1002 made top (rating hoch) but has no torrents → cascaded;
    // 1001 and 1005 survive with their matched variants
    assert(first._3 == Set("1001", "1005"))
    assert(first._4 == Set(("1001", "HD"), ("1001", "HQ"), ("1005", "MP4"), ("1005", "AVI")))
    Run.tick(spark, base)
    assert(state() == first, "second tick must be a state-level no-op")
  }

  test("tick guard: a file's spillover row into the NEXT day suppresses that day's file (reference quirk)") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_guard").toString
    // day A's file carries an after-midnight row landing in day B's
    // partition; the reference's table_isempty(PartitionKey) guard then
    // sees day B non-empty and SKIPS day B's file entirely
    def csvRow(id: String, beginn: String, titel: String) =
      (id, beginn, "05.03.2021 23:59:00", "30", "ZDF", titel, "1", "de", s"http://dl/$id")
    val dayA = Seq(
      csvRow("2001", "05.03.2021 20:00:00", "A-normal"),
      csvRow("2002", "06.03.2021 00:30:00", "A-spillover")).toDF(
      "Id", "beginn", "ende", "dauer", "sender", "titel", "genre_id", "language", "downloadlink")
    val dayB = Seq(csvRow("2003", "06.03.2021 21:00:00", "B-suppressed")).toDF(
      "Id", "beginn", "ende", "dauer", "sender", "titel", "genre_id", "language", "downloadlink")
    val (_, recsT, _, _) = Run.tick(spark, base,
      epgDays = Seq("2021_03_05", "2021_03_06"),
      epgDay = (_, day) => if (day == "2021_03_05") dayA else dayB)
    val got = recsT.read.select("PartitionKey", "RowKey")
      .as[(String, String)].collect().toSet
    assert(got.contains(("2021_03_05", "2001")))
    assert(got.contains(("2021_03_06", "2002")), "spillover row lands in day B's partition")
    assert(!got.exists(_._2 == "2003"), "day B's own file must be suppressed by the guard")
  }

  test("tick tiebreak: duplicate (day, Id) rows in one dirty file resolve deterministically") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_tie").toString
    // same Id twice on the same day: winner = minimum (beginn, titel,
    // downloadlink) — the payload total order upsertReplace applies
    def row(beginn: String, titel: String, dl: String) =
      ("3001", beginn, "05.03.2021 23:59:00", "30", "ZDF", titel, "1", "de", dl)
    val dirty = Seq(
      row("05.03.2021 20:00:00", "zz-later-title", "http://dl/z"),
      row("05.03.2021 20:00:00", "aa-first-title", "http://dl/a")).toDF(
      "Id", "beginn", "ende", "dauer", "sender", "titel", "genre_id", "language", "downloadlink")
    val (_, recsT, _, _) = Run.tick(spark, base,
      epgDays = Seq("D"), epgDay = (_, _) => dirty)
    val rows = recsT.read.filter($"RowKey" === "3001")
      .select("titel").as[String].collect().toSeq
    assert(rows == Seq("aa-first-title"),
      s"min (beginn, titel, downloadlink) must win deterministically, got $rows")
    // and re-running with the duplicate rows REVERSED yields the same winner
    val base2 = java.nio.file.Files.createTempDirectory("graft_tie2").toString
    val (_, recsT2, _, _) = Run.tick(spark, base2,
      epgDays = Seq("D"), epgDay = (_, _) => dirty.orderBy($"titel".desc))
    assert(recsT2.read.filter($"RowKey" === "3001")
      .select("titel").as[String].collect().toSeq == Seq("aa-first-title"))
  }
}
