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

  import org.apache.spark.sql.Column

  /** Container-format sniffing from MAGIC BYTES — real binary parsing,
    * no codec library involved: the first bytes of the payload identify
    * the format (PNG signature, JPEG SOI, RIFF/WAVE, GIF8). Pure
    * codegen'd byte arithmetic (`hex(substring(bin, …))`), row-local.
    */
  def sniffMime(payload: Column): Column =
    when(hex(substring(payload, 1, 8)) === "89504E470D0A1A0A", "image/png")
      .when(hex(substring(payload, 1, 2)) === "FFD8", "image/jpeg")
      .when(hex(substring(payload, 1, 4)) === "52494646" &&
        hex(substring(payload, 9, 4)) === "57415645", "audio/wav")
      .when(hex(substring(payload, 1, 4)) === "47494638", "image/gif")
      .otherwise("application/octet-stream")

  /** PNG dimensions parsed straight from the IHDR chunk (bytes 17–24:
    * width and height as 4-byte big-endian ints — PNG spec §11.2.2).
    * This is the real decode-metadata path for the one container whose
    * header needs no codec: `conv(hex(bytes), 16, 10)` — codegen'd,
    * row-local, works on genuine PNG files. Null when the payload is
    * not a PNG.
    */
  def pngWidth(payload: Column): Column =
    when(hex(substring(payload, 1, 8)) === "89504E470D0A1A0A",
      conv(hex(substring(payload, 17, 4)), 16, 10).cast("long"))

  def pngHeight(payload: Column): Column =
    when(hex(substring(payload, 1, 8)) === "89504E470D0A1A0A",
      conv(hex(substring(payload, 21, 4)), 16, 10).cast("long"))

  /** WAV sample rate parsed from the fmt chunk (bytes 25–28,
    * LITTLE-endian — the byte order PNG's big-endian path never
    * exercises): reassemble the reversed byte order explicitly with
    * per-byte hex extraction. Null when the payload is not RIFF/WAVE.
    */
  def wavSampleRate(payload: Column): Column = {
    // bytes 25..28 are LE: value = b28·2^24 + b27·2^16 + b26·2^8 + b25
    val le = concat((0 until 4).reverse.map(i =>
      hex(substring(payload, 25 + i, 1))): _*)
    when(hex(substring(payload, 1, 4)) === "52494646" &&
      hex(substring(payload, 9, 4)) === "57415645",
      conv(le, 16, 10).cast("long"))
  }

  /** Synthesize a minimal-but-valid PNG header prefix (signature + IHDR
    * length/type + dimensions) for round-trip tests: parse(synth(w, h))
    * must return (w, h). Width/height are 32-bit big-endian per spec.
    */
  def synthPngHeader(width: Column, height: Column): Column =
    concat(
      unhex(lit("89504E470D0A1A0A")), // signature
      unhex(lit("0000000D")),         // IHDR chunk length = 13
      unhex(lit("49484452")),         // "IHDR"
      unhex(lpad(hex(width), 8, "0")),
      unhex(lpad(hex(height), 8, "0")),
      unhex(lit("0806000000")))       // bit depth/color/etc.

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
