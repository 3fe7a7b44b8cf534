package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.model.Recording
import graft.operators.GraftTable
import graft.pipeline.Pipelines

/** End-to-end demo of the reference workload on the graft engine: lands
  * an EPG day-import into a day-partitioned keyed parquet table, refines
  * top recordings, matches torrents, and sessionizes the harness event
  * stream. Usage: Demo [workDir] [sfDir]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_demo").toString)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // --- E1: EPG CSV (reference-shaped, ';'-separated German formats) ---
    val epgCsv = Seq(
      ("101", "05.03.2021 20:15:00", "05.03.2021 21:45:00", "90", "Das Erste", "Tatort", "1", "de"),
      ("102", "05.03.2021 21:45:00", "05.03.2021 22:30:00", "45", "ZDF", "heute journal", "2", "de"),
      ("103", "06.03.2021 20:15:00", "06.03.2021 21:00:00", "45", "RTL 2", "Show", "99", "de"),
      ("104", "05.03.2021 22:00:00", "05.03.2021 23:00:00", "60", "BBC", "News", "1", "en"),
      ("105", "kaputt", "05.03.2021 23:00:00", "60", "arte", "Doku", "1", "de")
    ).toDF("Id", "beginn", "ende", "dauer", "sender", "titel", "genre_id", "language")
    val genres = Seq((1, "Spielfilm"), (2, "Nachrichten")).toDF("Genre_Id", "Genre")

    val recCols = Seq("PartitionKey", "RowKey", "Id", "beginn", "dauer", "sender",
      "titel", "genre_id", "genre", "language")
    val empty = Seq.empty[(String, String, Int, Timestamp, Int, String, String, Int, String, String)]
      .toDF(recCols: _*)

    val recordings = new GraftTable(spark, s"$work/recordings",
      keys = Seq("PartitionKey", "RowKey"), partitionCol = "PartitionKey")
    recordings.createIfNotExists(empty.schema)
    val imported = Pipelines.epgImport(epgCsv, genres, recordings.read)
    recordings.upsertReplace(imported, tiebreak = Seq("RowKey"))
    println(s"E1 recordings rows=${recordings.read.count()} " +
      s"partitions=${recordings.read.select("PartitionKey").distinct().count()}")
    recordings.read.orderBy("RowKey")
      .select("PartitionKey", "RowKey", "sender", "genre", "beginn").show(10, false)

    // re-import must be a no-op (U2/U3)
    recordings.upsertReplace(Pipelines.epgImport(epgCsv, genres, recordings.read),
      tiebreak = Seq("RowKey"))
    println(s"E1 idempotent rows=${recordings.read.count()}")

    // --- E2: top refinement ---
    val toplist = Seq(("2021_03_05", "101", "sehr hoch"), ("2021_03_06", "103", "hoch"),
      ("2021_03_05", "102", "mittel")).toDF("PartitionKey", "RowKey", "rating")
    val top = Pipelines.topRecordings(toplist, recordings.read, empty)
    println(s"E2 top rows=${top.count()}")
    top.select("PartitionKey", "RowKey", "titel").show(5, false)

    // --- E3: torrent match against the top partition ---
    val tracker = Seq(
      (Timestamp.valueOf("2021-03-05 20:15:00"), "daserste", "HD", 5),
      (Timestamp.valueOf("2021-03-05 20:15:00"), "daserste", "AVI", 2),
      (Timestamp.valueOf("2021-03-06 20:15:00"), "rtl2", "MP4", 1)
    ).toDF("beginn", "sender", "Resolution", "finished")
    val (matched, surviving) = Pipelines.torrentMatch(tracker, top,
      Timestamp.valueOf("2021-03-01 00:00:00"))
    println(s"E3 matched=${matched.count()} surviving_tops=${surviving.count()}")
    matched.select("PartitionKey", "RowKey", "sender", "finished").show(5, false)

    // --- keyed delete: drop one recording, its partition survives ---
    recordings.deleteByKeys(Seq(("2021_03_05", "102")).toDF("PartitionKey", "RowKey"))
    println(s"after delete rows=${recordings.read.count()}")

    // --- streaming: sessionize the harness event stream (batch-as-stream) ---
    val events = graft.Tables.events(spark, sfDir)
      .select($"user_id", $"ts").as[graft.streaming.Streams.Evt]
    val sessions = graft.streaming.Streams.sessionize(events, gapMs = 30 * 60 * 1000)
    println(s"sessions(batch-state pass) emitted=${sessions.count()} over ${events.count()} events")

    // --- multimodal plumbing over the documents table ---
    val media = graft.multimodal.Multimodal.asMediaTable(
      graft.Tables.documents(spark, sfDir).withColumn("payload", encode($"text", "UTF-8")),
      "doc_id", "payload", "text/plain")
    val feats = graft.multimodal.Multimodal.extractFeatures(media, frameSize = 64, stride = 64)
    println(s"media rows=${media.count()} total_frames=" +
      feats.agg(sum($"n_frames")).as[Long].collect().head)

    spark.stop()
  }
}
