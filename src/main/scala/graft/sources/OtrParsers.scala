package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.{SafeCastFns, TextFns}

/** Page→rows parsers for the reference's two paginated ordered HTML
  * scrapes (SURVEY §2.A S5/S6), re-expressed as dataflow: a
  * `Dataset[String]` of raw page bodies (produced by the driver-side
  * staging fetcher) flat-mapped/split into typed rows with codegen'd
  * column expressions. The reference's per-row `split(...)[i]` chains
  * (`server/etl.py:130-138,181-194`) become `split`/`element_at`
  * (negative index = from-end, matching Python's `fileparts[len-4]`)
  * and `regexp_extract`.
  */
object OtrParsers {

  /** Toplist page rows (`server/etl.py:130-138`): each `<tr>`-ish chunk
    * carries epg_id, rating, preview image link and a `dd.MM.yy` date.
    * Input: one row per raw page chunk with columns (chunk: String).
    */
  def parseToplist(chunks: Dataset[String]): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.toDF("chunk")
      .select(
        regexp_extract($"chunk", "epg_id=(\\d+)", 1).as("epg_id"),
        regexp_extract($"chunk", "rating='([^']*)'", 1).as("rating"),
        regexp_extract($"chunk", "img src='([^']*)'", 1).as("previewimagelink"),
        SafeCastFns.safeDate(regexp_extract($"chunk", "(\\d{2}\\.\\d{2}\\.\\d{2})", 1),
          "dd.MM.yy", lit("1900-01-01").cast("date")).as("date"))
      .filter($"epg_id" =!= "")
      .withColumn("PartitionKey", TextFns.dayKey($"date"))
      .withColumn("RowKey", $"epg_id")
  }

  /** Tracker page rows (`server/etl.py:181-206`): link + file name +
    * finished/loading/loaded counters; `beginn` and `sender` are derived
    * from the FILENAME's trailing tokens (from-end indexing
    * `fileparts[len-4..len-2]`, `server/etl.py:192-194`), the time key
    * re-assembled as `yy.MM.dd HH-mm-00` and the sender normalized
    * (lower, no spaces, `server/etl.py:206`).
    */
  def parseTracker(chunks: Dataset[String]): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.toDF("chunk")
      .select(
        regexp_extract($"chunk", "href='([^']*)'", 1).as("TorrentLink"),
        // the display name is the anchor TEXT (reference etl.py:187)
        regexp_extract($"chunk", "'>([^<]+)</a>", 1).as("TorrentFile"),
        SafeCastFns.safeInt(regexp_extract($"chunk", "finished=(\\d+)", 1)).as("finished"),
        SafeCastFns.safeInt(regexp_extract($"chunk", "loading=(\\d+)", 1)).as("loading"),
        SafeCastFns.safeInt(regexp_extract($"chunk", "loaded=(\\d+)", 1)).as("loaded"))
      .filter($"TorrentFile" =!= "")
      // the reference tokenizes the display name on SPACES (etl.py:192)
      .withColumn("fileparts", split($"TorrentFile", " "))
      // fileparts[len-4] = date token, [len-3] = time token, [len-2] = sender
      .withColumn("beginn", SafeCastFns.safeTimestamp(
        concat_ws(" ", element_at($"fileparts", -4),
          concat(element_at($"fileparts", -3), lit("-00"))),
        "yy.MM.dd HH-mm-ss", lit("1900-01-01").cast("timestamp")))
      .withColumn("sender", TextFns.normalizeKey(element_at($"fileparts", -2)))
      .withColumn("Resolution",
        TextFns.classifyResolution(TextFns.resolutionToken($"TorrentLink")))
      .drop("fileparts")
  }
}
