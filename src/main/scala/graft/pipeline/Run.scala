package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructType, TimestampType}

import graft.model.{Defaults, Genre, Recording, Torrent}
import graft.operators.{GraftTable, KeyedTable}
import graft.sources.{Fixtures, OtrParsers}

/** The reference's ETL tick (`runetl.py:27-69` / `server/etl.py:19-21`),
  * end-to-end against [[GraftTable]]-persisted parquet tables:
  *
  *   genres → E1 per-day EPG import → E2 toplist refinement →
  *   E3 torrent match + cascade delete
  *
  * Every stage is guarded the way the reference guards it — genres load
  * only into an empty dimension (`server/etl.py:29`), EPG days only into
  * absent partitions (`:71`), toplist rows insert-if-absent (`:148-149`)
  * — so a second tick over the same inputs is a no-op for E1/E2 and a
  * fixed point for E3: `tick` is idempotent at the state level.
  *
  * `main` runs one tick over the checked-in fixtures:
  * `Run [baseDir] [startdateTs]`.
  */
object Run {

  /** Conform `df` to `schema`: reorder, cast, and default-fill missing
    * columns (string → "", int → 0, timestamp → the reference 1900 epoch)
    * so frames from heterogeneous sources write into one table layout.
    */
  def conform(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.map { f =>
      if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else f.dataType match {
        case IntegerType   => lit(0).as(f.name)
        case TimestampType => lit(Defaults.epoch).as(f.name)
        case _             => lit("").as(f.name)
      }
    }.toSeq: _*)

  /** One ETL tick over the fixture inputs. Returns the four tables.
    * `epgDay` injects the per-day CSV frame source (default: the
    * checked-in fixtures) so the per-day guard and dirty-file tiebreak
    * semantics are testable with synthetic days (`PipelinesSpec`).
    */
  def tick(spark: SparkSession, base: String,
           startdate: Timestamp = Timestamp.valueOf("2021-03-01 00:00:00"),
           epgDays: Seq[String] = Seq("2021_03_05", "2021_03_06"),
           epgDay: (SparkSession, String) => DataFrame = Fixtures.epgCsvDay)
      : (GraftTable, GraftTable, GraftTable, GraftTable) = {
    val keys = Seq("PartitionKey", "RowKey")

    // genres dimension — import only when the 'all' partition is absent
    // (reference table_isempty guard, server/etl.py:29): partition-grain
    // import-once IS that guard
    val genresT = new GraftTable(spark, s"$base/genres", keys, "PartitionKey")
      .createIfNotExists(Genre.schema)
      .importOnce(conform(Pipelines.genresLoad(Fixtures.genresCsv(spark)), Genre.schema))
    val genres = genresT.read

    // E1 — per-day EPG import. The guard is EXACTLY the reference's:
    // skip the FILE when its nominal day partition already has rows
    // (table_isempty(Recording, PartitionKey), server/etl.py:71) —
    // including the reference's quirk that a previous file's spillover
    // row into this day's partition suppresses this day's file. The rows
    // themselves are applied as keyed UPSERTS (per-row tmp.save() in the
    // reference), not a partition-grain importOnce — a file's rows can
    // land in OTHER partitions (after-midnight listings, the 1900_01_01
    // bad-date default) and still apply. The tiebreak is a PAYLOAD
    // order (keys would be a no-op inside their own window) so a dirty
    // file carrying duplicate (day, Id) rows resolves deterministically.
    val recsT = new GraftTable(spark, s"$base/recordings", keys, "PartitionKey")
      .createIfNotExists(Recording.schema)
    epgDays.foreach { day =>
      val dayPresent = KeyedTable.exists(
        recsT.read.filter(col("PartitionKey") === day))
      if (!dayPresent)
        recsT.upsertReplace(
          conform(Pipelines.epgRecords(epgDay(spark, day), genres),
            Recording.schema),
          tiebreak = Seq("beginn", "titel", "downloadlink"))
    }

    // E2 — toplist refinement: parse → rating threshold → semi-join to
    // existing recordings → re-key to 'top' → insert-if-absent
    // (server/etl.py:112-161)
    val topT = new GraftTable(spark, s"$base/top", keys, "PartitionKey")
      .createIfNotExists(Recording.schema)
    import spark.implicits._
    val toplist = OtrParsers.parseToplist(
      Fixtures.chunks(spark, "toplist_chunks.txt").select("chunk").as[String])
    val kept = toplist.filter(col("rating").isin("sehr hoch", "hoch"))
    val rekeyed = recsT.read
      .join(kept.select("PartitionKey", "RowKey"), Seq("PartitionKey", "RowKey"), "left_semi")
      .withColumn("PartitionKey", lit("top"))
    topT.insertIfAbsent(conform(rekeyed, Recording.schema))

    // E3 — torrent match + upsert + cascade delete (server/etl.py:163-260)
    val torrT = new GraftTable(spark, s"$base/torrents", keys, "PartitionKey")
      .createIfNotExists(Torrent.schema)
    val tracker = OtrParsers.parseTracker(
      Fixtures.chunks(spark, "tracker_chunks.txt").select("chunk").as[String])
    val (matched, surviving) = Pipelines.torrentMatch(tracker, topT.read, startdate)
    torrT.upsertReplace(conform(matched, Torrent.schema), tiebreak = Seq("TorrentLink"))
    val (doomedTops, doomedTorrents) =
      Pipelines.cascadeDelete(topT.read, surviving, torrT.read)
    // materialize the key frames (lineage break, still distributed) BEFORE
    // the first delete mutates the top-table files both plans read
    val dTops = doomedTops.localCheckpoint(true)
    val dTorr = doomedTorrents.localCheckpoint(true)
    topT.deleteByKeys(dTops)
    torrT.deleteByKeys(dTorr)
    dTops.unpersist(); dTorr.unpersist()
    (genresT, recsT, topT, torrT)
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft_etl")
    val startdate = args.lift(1).map(Timestamp.valueOf)
      .getOrElse(Timestamp.valueOf("2021-03-01 00:00:00"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (g, r, t, z) = tick(spark, base, startdate)
    println(s"genres=${g.read.count()} recordings=${r.read.count()} " +
      s"top=${t.read.count()} torrents=${z.read.count()}")
    spark.stop()
  }
}
