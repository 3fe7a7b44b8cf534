package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{SafeCastFns, TextFns}
import graft.model.{Genre, Recording}
import graft.operators.KeyedTable

/** The reference's three pipelines (SURVEY §3), re-expressed as pure
  * DataFrame transforms so they unit-test against fixtures and run
  * identically at any scale. Each is one declarative plan: Catalyst gets
  * to push filters into the scans, broadcast the dimensions and plan the
  * joins — the reference's hand-rolled per-row REST probes disappear.
  */
object Pipelines {

  /** Genres dimension load (`import_otrgenres`, reference
    * `server/etl.py:25-55`): the `;`-CSV's `Nummer`/`Kategorie` become
    * `(Genre_Id, Genre)`; `PartitionKey` is the literal `'all'` and
    * `RowKey` the RAW `Nummer` string (`server/etl.py:42` — so a
    * non-numeric `Nummer` keeps its own key while `Genre_Id` safe-casts
    * to 0, `storage/tablemodels.py:101`). Duplicate `Nummer` rows
    * collapse per key (the reference's sequential per-row upsert); the
    * max-`Genre` winner makes the collapse order-independent.
    */
  def genresLoad(genresCsv: DataFrame): DataFrame =
    genresCsv.select(
        lit("all").as("PartitionKey"),
        col("Nummer").as("RowKey"),
        SafeCastFns.safeInt(col("Nummer")).as("Genre_Id"),
        col("Kategorie").as("Genre"))
      .groupBy("PartitionKey", "RowKey")
      .agg(max(col("Genre_Id")).as("Genre_Id"), max(col("Genre")).as("Genre"))
      .select(Genre.schema.fieldNames.map(col).toSeq: _*)

  /** E1's per-row transform (reference `server/etl.py:89-99`): typed,
    * keyed, genre-enriched recording rows ready to upsert — the update
    * side of [[epgImport]], exposed separately so the orchestrator can
    * feed a persistent [[graft.operators.GraftTable]].
    */
  def epgRecords(epgCsv: DataFrame, genres: DataFrame): DataFrame = {
    val epoch = lit("1900-01-01 00:00:00").cast("timestamp")
    val typed = epgCsv
      .filter(col("language") === "de")
      .withColumn("beginn", SafeCastFns.safeTimestamp(col("beginn"), Recording.timestampFormat, epoch))
      .withColumn("ende", SafeCastFns.safeTimestamp(col("ende"), Recording.timestampFormat, epoch))
      .withColumn("Id", SafeCastFns.safeInt(col("Id")))
      .withColumn("dauer", SafeCastFns.safeInt(col("dauer")))
      .withColumn("genre_id", SafeCastFns.safeInt(col("genre_id")))
      .withColumn("PartitionKey", TextFns.dayKey(col("beginn")))
      .withColumn("RowKey", col("Id").cast("string"))
    KeyedTable.lookupEnrich(typed, genres,
      "genre_id", "Genre_Id", "Genre", "genre", "Sonstiges")
  }

  /** E1 — EPG day import (`import_otrepg`, reference `server/etl.py:57-110`).
    *
    * CSV frame (one or more days) → keep `language == 'de'` (`:95`) →
    * derive `(PartitionKey, RowKey)` = (day key of `beginn`, `Id`)
    * (`:96-97`) → broadcast genre enrich with `'Sonstiges'` default
    * (`:98`, `storage/tablemodels.py:98-104`) → safe-cast the typed
    * columns (§1.2) → upsert-merge into the recordings table keyed by
    * `(PartitionKey, RowKey)` (K3). Re-running is idempotent (U2/U3).
    */
  def epgImport(epgCsv: DataFrame, genres: DataFrame, recordings: DataFrame): DataFrame = {
    val enriched = epgRecords(epgCsv, genres)
    val cols = recordings.columns
    KeyedTable.upsertMerge(recordings,
      enriched.select(cols.filter(enriched.columns.contains).map(col).toSeq: _*),
      Seq("PartitionKey", "RowKey"),
      Recording.defaults.filter { case (k, _) => cols.contains(k) })
  }

  /** E2 — top-recordings refinement (`update_toprecordings`, reference
    * `server/etl.py:112-161`).
    *
    * Parsed toplist rows → keep ratings in {sehr hoch, hoch} (`:141`,
    * the rank-threshold early stop T1 — rating is monotone in rank, so
    * the stop IS this filter) → semi-join against existing recordings on
    * `(PartitionKey, RowKey)` (J2: only scraped ids that exist) → re-key
    * to the 'top' partition (K7 copyto, `:147`) → insert-if-absent into
    * the target (K8, `:148-149`).
    */
  def topRecordings(toplist: DataFrame, recordings: DataFrame, top: DataFrame): DataFrame = {
    val kept = toplist.filter(col("rating").isin("sehr hoch", "hoch"))
    val existing = kept.join(recordings, Seq("PartitionKey", "RowKey"), "left_semi")
    val matched = recordings.join(
      existing.select("PartitionKey", "RowKey"), Seq("PartitionKey", "RowKey"), "left_semi")
    val rekeyed = matched.withColumn("PartitionKey", lit("top"))
    KeyedTable.insertIfAbsent(top, rekeyed, Seq("PartitionKey", "RowKey"))
  }

  /** E3 — torrent matching (`update_torrents`, reference
    * `server/etl.py:163-260`).
    *
    * Parsed tracker rows → rolling window `beginn >= startdate` (`:196`,
    * P5/T2) → derive the composite join key (formatted time + normalized
    * sender) on BOTH sides (`:193-194,206,251`) → inner join to the
    * 'top' recordings (J3, 1:N — every matching variant kept, keyed
    * `(Id, Resolution)`) and anti-join for tops with zero torrents →
    * cascade delete (J4/K5, `:257-259` — implementing the INTENT: the
    * reference's leaked loop variable is a bug, SURVEY §2.D).
    *
    * Returns (matchedTorrents, survivingTops).
    */
  def torrentMatch(tracker: DataFrame, tops: DataFrame,
                   startdate: java.sql.Timestamp): (DataFrame, DataFrame) = {
    val windowed = tracker.filter(col("beginn") >= lit(startdate))
      .withColumn("jk", concat_ws("|", TextFns.timeKey(col("beginn")), col("sender")))
    val keyedTops = tops.withColumn("jk",
      concat_ws("|", TextFns.timeKey(col("beginn")), TextFns.normalizeKey(col("sender"))))
    val matched = windowed.join(
        keyedTops.select(col("jk"), col("Id")), Seq("jk"))
      .withColumn("PartitionKey", col("Id").cast("string"))
      .withColumn("RowKey", col("Resolution"))
      .drop("jk")
    val surviving = keyedTops
      .join(windowed.select("jk"), Seq("jk"), "left_semi").drop("jk")
    (matched, surviving)
  }

  /** E3's cascade, composed (reference INTENT at `server/etl.py:257-259`,
    * SURVEY §2.D — the reference's leaked loop variable deletes the wrong
    * row; this implements what it meant): top recordings with ZERO
    * matching torrents in the window are deleted from the top table, and
    * any stored torrent whose parent top is gone is deleted with it.
    *
    * Returns (topDeleteKeys, torrentDeleteKeys) — key frames for
    * [[graft.operators.GraftTable.deleteByKeys]] / [[KeyedTable.deleteByKeys]],
    * so the caller decides the storage side.
    */
  def cascadeDelete(tops: DataFrame, surviving: DataFrame,
                    storedTorrents: DataFrame): (DataFrame, DataFrame) = {
    val doomedTops = tops.select("PartitionKey", "RowKey")
      .join(surviving.select("PartitionKey", "RowKey"),
        Seq("PartitionKey", "RowKey"), "left_anti")
    // torrent PartitionKey = recording Id = top RowKey (tablemodels.py:27-29)
    val doomedTorrents = storedTorrents.select("PartitionKey", "RowKey")
      .join(doomedTops.select(col("RowKey").as("PartitionKey")),
        Seq("PartitionKey"), "left_semi")
    (doomedTops, doomedTorrents)
  }
}
