package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Typed row models mirroring the reference schemas
  * (`storage/tablemodels.py:14-74`): class-attribute defaults double as
  * type declarations there; here they are case-class defaults plus an
  * explicit `StructType` and a defaults map that the MERGE layer uses
  * (non-default columns win on upsert-merge — reference
  * `storage/azurestoragewrapper.py:183`).
  */
object Defaults {
  /** The reference epoch default for unparseable datetimes
    * (`storage/tablemodels.py:41-42`): 1900-01-01 00:00:00.
    */
  val epoch: Timestamp = Timestamp.valueOf("1900-01-01 00:00:00")
}

/** Genre dimension (`storage/tablemodels.py:71-74`): PartitionKey is the
  * literal 'all', RowKey the genre number (`server/etl.py:42`).
  */
final case class Genre(
    PartitionKey: String = "all",
    RowKey: String = "",
    Genre_Id: Int = 0,
    Genre: String = "")

object Genre {
  val schema: StructType = StructType(Seq(
    StructField("PartitionKey", StringType),
    StructField("RowKey", StringType),
    StructField("Genre_Id", IntegerType),
    StructField("Genre", StringType)))
  val defaults: Map[String, Any] = Map("Genre_Id" -> 0, "Genre" -> "")
}

/** Recording fact row (`storage/tablemodels.py:35-68`): PartitionKey is
  * the broadcast day `yyyy_MM_dd` or the literal 'top'
  * (`server/etl.py:67,96,147`), RowKey the EPG Id (`server/etl.py:97`).
  * Datetime columns parse with `dd.MM.yyyy HH:mm:ss`
  * (`storage/tablemodels.py:38`).
  */
final case class Recording(
    PartitionKey: String = "",
    RowKey: String = "",
    Id: Int = 0,
    beginn: Timestamp = Defaults.epoch,
    ende: Timestamp = Defaults.epoch,
    dauer: Int = 0,
    sender: String = "",
    titel: String = "",
    typ: String = "",
    text: String = "",
    genre_id: Int = 0,
    genre: String = "",
    fsk: String = "",
    language: String = "",
    weekday: String = "",
    zusatz: String = "",
    wdh: String = "",
    downloadlink: String = "",
    infolink: String = "",
    programlink: String = "",
    previewimagelink: String = "",
    rating: String = "")

object Recording {
  val schema: StructType =
    org.apache.spark.sql.Encoders.product[Recording].schema
  val timestampFormat = "dd.MM.yyyy HH:mm:ss" // tablemodels.py:38 ('%d.%m.%Y %H:%M:%S')
  val dateFormat = "dd.MM.yyyy"               // tablemodels.py:37 ('%d.%m.%Y')
  val defaults: Map[String, Any] = Map(
    "Id" -> 0, "dauer" -> 0, "genre_id" -> 0,
    "beginn" -> Defaults.epoch, "ende" -> Defaults.epoch,
    "sender" -> "", "titel" -> "", "typ" -> "", "text" -> "", "genre" -> "",
    "fsk" -> "", "language" -> "", "weekday" -> "", "zusatz" -> "", "wdh" -> "",
    "downloadlink" -> "", "infolink" -> "", "programlink" -> "",
    "previewimagelink" -> "", "rating" -> "")
}

/** Torrent child row (`storage/tablemodels.py:14-33`): PartitionKey is
  * the recording Id (`:27-29`), RowKey the resolution variant (`:31-33`)
  * — 1:N per top recording.
  */
final case class Torrent(
    PartitionKey: String = "",
    RowKey: String = "",
    Id: Int = 0,
    Resolution: String = "",
    TorrentLink: String = "",
    TorrentFile: String = "",
    beginn: Timestamp = Defaults.epoch,
    sender: String = "",
    finished: Int = 0,
    loading: Int = 0,
    loaded: Int = 0)

object Torrent {
  val schema: StructType =
    org.apache.spark.sql.Encoders.product[Torrent].schema
  /** Derived-from-filename time key (`server/etl.py:193`, `'%y.%m.%d %H-%M-%S'`). */
  val timestampFormat = "yy.MM.dd HH-mm-ss"
  val defaults: Map[String, Any] = Map(
    "Id" -> 0, "Resolution" -> "", "TorrentLink" -> "", "TorrentFile" -> "",
    "beginn" -> Defaults.epoch, "sender" -> "",
    "finished" -> 0, "loading" -> 0, "loaded" -> 0)
}
