package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns next to a typed metadata struct, and the
  * decode/feature-extract stage runs as a partition-wise batch transform
  * (`mapPartitions` over a typed Dataset — the Scala analogue of a
  * batched pandas UDF: one iterator per partition, no per-row JVM↔
  * library round trips).
  *
  * The actual codec is STUBBED (`StubDecoder`) — the container has no
  * image/audio libraries — but everything Spark-side is real and tested:
  * the schema, the partitioning, the batch iterator shape, and the
  * deterministic sampling. Swapping in a real decoder is one function.
  */
object Multimodal {

  /** One media row: payload + typed metadata. */
  final case class MediaRow(doc_id: Long, mime: String, n_bytes: Long, payload: Array[Byte])

  /** Decoded features for one row (what a real decoder would emit —
    * dimensions, duration, frame fingerprints, an embedding…).
    */
  final case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
                                 n_frames: Int, frame_fps: Seq[String])

  /** Wrap a text/binary source column as a media table: payload bytes +
    * metadata columns. (With real media, this is the parquet/binaryFile
    * read; schema is identical.)
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
                   mime: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).as("doc_id"), lit(mime).as("mime"),
        octet_length(col(payloadCol)).cast("long").as("n_bytes"),
        col(payloadCol).cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Deterministic frame sampling: byte slices at a fixed stride stand in
    * for decoded video frames. A real decoder replaces `StubDecoder.frames`
    * only — the distributed shape (partition-wise batches, bounded memory
    * per task, no driver involvement) stays identical.
    */
  def extractFeatures(media: Dataset[MediaRow], frameSize: Int, stride: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens HERE (a real codec would open its
      // context once per partition, not once per row)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val frames = StubDecoder.frames(r.payload, frameSize, stride)
        val fps = frames.map { f =>
          md.reset(); md.update(f)
          md.digest().map("%02x".format(_)).mkString
        }
        MediaFeatures(r.doc_id, r.mime, r.n_bytes, fps.size, fps)
      }
    }
  }
}

/** Stand-in codec: deterministic byte-slice "frames". Replace with a real
  * image/audio/video library binding when available; the call site and
  * distributed execution shape do not change.
  */
object StubDecoder {
  def frames(payload: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] =
    if (payload == null || payload.isEmpty) Seq.empty
    else (0 until payload.length by stride)
      .map(off => payload.slice(off, math.min(off + frameSize, payload.length)))
      .filter(_.nonEmpty)
}
