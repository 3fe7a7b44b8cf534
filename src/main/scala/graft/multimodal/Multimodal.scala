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
  * The codec is REAL for WAV PCM — [[WavCodec]] walks the RIFF chunk
  * list and decodes 8/16-bit integer PCM samples in pure JVM code, no
  * media library — and frames/fingerprints are computed over decoded
  * SAMPLES for audio payloads. Payloads the codec cannot decode (JPEG
  * pixels, video) fall back to opaque byte windows: the distributed
  * shape (partition-wise batches, bounded memory per task, no driver
  * involvement) is identical either way, so swapping in further codecs
  * changes one function.
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

  /** Deterministic frame extraction. WAV PCM payloads DECODE — frames
    * are `frameSize`-sample windows at `stride` over the real decoded
    * sample stream, fingerprinted over the canonical 16-bit LE image of
    * the sample values (so the fingerprint is a function of the audio,
    * not of container framing). Undecodable payloads fall back to
    * `frameSize`-byte windows over the raw bytes — the honest treatment
    * of a format with no in-container codec.
    */
  def extractFeatures(media: Dataset[MediaRow], frameSize: Int, stride: Int): Dataset[MediaFeatures] = {
    require(frameSize >= 1, s"frameSize must be >= 1, got $frameSize")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens HERE (a real codec would open its
      // context once per partition, not once per row)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val frames: Seq[Array[Byte]] = WavCodec.decode(r.payload) match {
          case Some(pcm) =>
            WavCodec.sampleWindows(pcm.samples, frameSize, stride)
              .map(WavCodec.encodeLe16)
          case None => byteWindows(r.payload, frameSize, stride)
        }
        val fps = frames.map { f =>
          md.reset(); md.update(f)
          md.digest().map("%02x".format(_)).mkString
        }
        MediaFeatures(r.doc_id, r.mime, r.n_bytes, fps.size, fps)
      }
    }
  }

  /** Opaque-payload fallback framing: strided byte windows. */
  private def byteWindows(payload: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] =
    if (payload == null || payload.isEmpty) Seq.empty
    else (0 until payload.length by stride)
      .map(off => payload.slice(off, math.min(off + frameSize, payload.length)))
      .filter(_.nonEmpty)

  /** Per-frame integer statistics over DECODED WAV samples — one row per
    * (doc, frame): header fields from the parsed fmt chunk + count/sum/
    * min/max of the window, all integer-exact so a replayed oracle
    * hash-matches. Undecodable payloads contribute no rows (they have no
    * samples; `extractFeatures` is the API that frames opaque bytes).
    */
  def wavFrameStats(media: Dataset[MediaRow], frameSize: Int, stride: Int): Dataset[WavFrame] = {
    require(frameSize >= 1, s"frameSize must be >= 1, got $frameSize")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        WavCodec.decode(r.payload).toSeq.flatMap { pcm =>
          WavCodec.sampleWindows(pcm.samples, frameSize, stride).zipWithIndex.map {
            case (w, i) => WavFrame(r.doc_id, pcm.sampleRate, pcm.bitsPerSample,
              i.toLong, w.length.toLong, w.map(_.toLong).sum, w.min, w.max)
          }
        }
      }
    }
  }

  /** One decoded audio frame's statistics. */
  final case class WavFrame(doc_id: Long, sample_rate: Int, bits: Int,
                            frame_id: Long, n_samples: Long, s_sum: Long,
                            s_min: Int, s_max: Int)

  /** One decoded frame's absolute-amplitude mass (the VAD feature). */
  final case class WavAbsFrame(doc_id: Long, frame_id: Long,
                               n_samples: Long, abs_sum: Long)

  /** SILENCE SEGMENTATION over decoded WAV PCM — the clip-extraction
    * step speech/audio training pipelines run before anything else
    * (trim silence, keep voiced runs): tile each clip into
    * `frameSize`-sample frames, mark a frame ACTIVE when its mean
    * absolute amplitude reaches `thrMilli`/1000 (integer
    * cross-multiplied — partial tail frames compare correctly), and
    * merge consecutive active frames into maximal segments via the
    * gaps-and-islands rule (island = frame_id − row_number, one
    * per-doc window bounded by frames-per-clip). Output one row per
    * segment: (doc_id, start_frame, end_frame, n_frames, energy).
    *
    * The decode stays at the [[wavFrameStats]] mapPartitions codec
    * boundary (the repo's one sanctioned imperative seam); everything
    * after the per-frame abs-sums is declarative and engine-exact.
    */
  def wavSilenceSegments(media: Dataset[MediaRow], frameSize: Int,
                         thrMilli: Long): DataFrame = {
    require(frameSize >= 1, s"frameSize must be >= 1, got $frameSize")
    require(thrMilli >= 0, s"thrMilli must be >= 0, got $thrMilli")
    val spark = media.sparkSession
    import spark.implicits._
    val frames = media.mapPartitions { rows =>
      rows.flatMap { r =>
        WavCodec.decode(r.payload).toSeq.flatMap { pcm =>
          WavCodec.sampleWindows(pcm.samples, frameSize, frameSize).zipWithIndex
            .map { case (w, i) =>
              WavAbsFrame(r.doc_id, i.toLong, w.length.toLong,
                w.map(s => math.abs(s.toLong)).sum)
            }
        }
      }
    }.toDF()
    val active = frames
      .filter(col("abs_sum") * 1000 >= lit(thrMilli) * col("n_samples"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_id")
    active
      .withColumn("island", col("frame_id") - row_number().over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("frame_id")).as("start_frame"),
        max(col("frame_id")).as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum(col("abs_sum")).as("energy"))
      .select("doc_id", "start_frame", "end_frame", "n_frames", "energy")
  }

  /** Little-endian byte rendering of the low `nBytes` bytes of an
    * integer column — the RIFF encoding primitive (PNG's synth path is
    * big-endian; WAV is LE throughout).
    */
  private def le(v: Column, nBytes: Int): Column =
    concat((0 until nBytes).map(i =>
      unhex(lpad(hex(pmod(shiftright(v, 8 * i), lit(256))), 2, "0"))): _*)

  /** Synthesize a COMPLETE valid 24-bit BI_RGB BMP file from raw
    * (already padded, bottom-up, BGR) `pixelData` binary — the image
    * counterpart of [[synthWavPcm16]]: `BmpCodec.decode` round-trips it
    * exactly, which is what the q111 oracle checks end to end.
    */
  def synthBmp24(width: Column, height: Column, pixelData: Column): Column = {
    val n = octet_length(pixelData).cast("long")
    concat(
      lit("BM".getBytes("US-ASCII")), le(n + 54L, 4),              // magic + file size
      le(lit(0L), 4), le(lit(54L), 4),                             // reserved + data offset
      le(lit(40L), 4), le(width.cast("long"), 4),                  // info size + dims
      le(height.cast("long"), 4),
      le(lit(1L), 2), le(lit(24L), 2),                             // planes + bpp
      le(lit(0L), 4), le(n, 4),                                    // BI_RGB + image size
      le(lit(2835L), 4), le(lit(2835L), 4),                        // 72 dpi
      le(lit(0L), 4), le(lit(0L), 4),                              // palette counts
      pixelData)
  }

  /** Per-image statistics over DECODED BMP pixels — one row per doc:
    * dimensions + integer channel sums + a POSITION-WEIGHTED red sum
    * (Σ r(x,y)·(x + w·y) over logical coordinates), which is exactly the
    * stat that breaks if the decoder gets the bottom-up row order or BGR
    * byte order wrong. Undecodable payloads contribute no rows.
    */
  def bmpPixelStats(media: Dataset[MediaRow]): Dataset[BmpStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        BmpCodec.decode(r.payload).map { bmp =>
          var sr = 0L; var sg = 0L; var sb = 0L; var wr = 0L
          var i = 0
          while (i < bmp.pixels.length) {
            val p = bmp.pixels(i)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            wr += ((p >> 16) & 0xff).toLong * i
            i += 1
          }
          BmpStats(r.doc_id, bmp.width, bmp.height,
            bmp.pixels.length.toLong, sr, sg, sb, wr)
        }
      }
    }
  }

  /** One decoded image's statistics. */
  final case class BmpStats(doc_id: Long, width: Int, height: Int,
                            n_pixels: Long, sum_r: Long, sum_g: Long,
                            sum_b: Long, wsum_r: Long)

  /** Nearest-neighbor RESIZE of a row-major 0xRRGGBB pixel array:
    * target (x2, y2) samples source (⌊x2·w/w2⌋, ⌊y2·h/h2⌋) — the
    * standard integer NN rule, exact in both directions (up- and
    * down-scale), closed-form replayable by a SQL oracle.
    */
  def resizeNearest(pixels: Array[Int], w: Int, h: Int,
                    w2: Int, h2: Int): Array[Int] = {
    val out = new Array[Int](w2 * h2)
    var y2 = 0
    while (y2 < h2) {
      val sy = y2 * h / h2
      var x2 = 0
      while (x2 < w2) {
        out(y2 * w2 + x2) = pixels(sy * w + x2 * w / w2)
        x2 += 1
      }
      y2 += 1
    }
    out
  }

  /** The RESIZE member of the multimodal pipeline (decode /
    * feature-extract / resize / frame-sample): decode each BMP, resize
    * nearest-neighbor to (w2, h2), and emit the SAME position-weighted
    * stats as [[bmpPixelStats]] — over the RESIZED pixels, so a wrong
    * source-index rule, row order, or channel order anywhere in
    * decode→resize breaks the hash. Executor-side at the opaque-codec
    * boundary; undecodable payloads contribute no rows.
    */
  def bmpResizedStats(media: Dataset[MediaRow], w2: Int, h2: Int): Dataset[BmpStats] = {
    require(w2 >= 1 && h2 >= 1, s"target dims must be >= 1, got ($w2, $h2)")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        BmpCodec.decode(r.payload).map { bmp =>
          val px = resizeNearest(bmp.pixels, bmp.width, bmp.height, w2, h2)
          var sr = 0L; var sg = 0L; var sb = 0L; var wr = 0L
          var i = 0
          while (i < px.length) {
            val p = px(i)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            wr += ((p >> 16) & 0xff).toLong * i
            i += 1
          }
          BmpStats(r.doc_id, w2, h2, px.length.toLong, sr, sg, sb, wr)
        }
      }
    }
  }

  /** Input row for [[synthPngMedia]]: dimensions + row-major 0xRRGGBB
    * pixels (generated declaratively in the query so the oracle can
    * replay the generator).
    */
  final case class PngSynthRow(doc_id: Long, w: Int, h: Int, pixels: Seq[Int])

  /** Encode each row's pixel array as a COMPLETE valid PNG ([[PngCodec
    * .encodeRgb]]: real zlib, real CRCs) with the scanline filter type
    * CYCLING `(doc_id + y) % 5` — every image with ≥5 rows exercises
    * all five PNG filters, so the decode side can't pass without all
    * five inverse filters being right. Executor-side mapPartitions at
    * the opaque-codec boundary, like the WAV/BMP paths.
    */
  def synthPngMedia(df: DataFrame): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[PngSynthRow].mapPartitions { rows =>
      rows.map { r =>
        val payload = PngCodec.encodeRgb(r.w, r.h, r.pixels.toArray,
          y => ((r.doc_id + y) % 5).toInt)
        MediaRow(r.doc_id, "image/png", payload.length.toLong, payload)
      }
    }
  }

  /** Per-image statistics over DECODED PNG pixels — the raster stats of
    * [[bmpPixelStats]] computed off the inflate+unfilter decode path:
    * the position-weighted red sum breaks if any of the five inverse
    * filters, the scanline order, or the RGB byte order is wrong.
    * Undecodable payloads contribute no rows.
    */
  def pngPixelStats(media: Dataset[MediaRow]): Dataset[BmpStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        PngCodec.decode(r.payload).map { png =>
          var sr = 0L; var sg = 0L; var sb = 0L; var wr = 0L
          var i = 0
          while (i < png.pixels.length) {
            val p = png.pixels(i)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            wr += ((p >> 16) & 0xff).toLong * i
            i += 1
          }
          BmpStats(r.doc_id, png.width, png.height,
            png.pixels.length.toLong, sr, sg, sb, wr)
        }
      }
    }
  }

  /** Input row for [[synthMp4Media]]: movie-level fields + parallel
    * per-track dimension arrays (generated declaratively in the query so
    * the oracle can replay the generator; the encoder assigns track id
    * `t + 1` to the t-th entry).
    */
  final case class Mp4SynthRow(doc_id: Long, brand: String, timescale: Long,
                               duration: Long, mvhd_v1: Boolean,
                               tk_w: Seq[Int], tk_h: Seq[Int])

  /** Encode each row as a COMPLETE valid ISO-BMFF container
    * ([[Mp4Meta.encode]]): ftyp + skipped `free` box + moov(mvhd +
    * trak/tkhd per track) + a largesize mdat. Header layout VARIES by
    * row — mvhd v1 when `mvhd_v1`, tkhd v1 when `(doc_id + t) % 2 == 0`
    * — so a corpus exercises all four version layouts and the 64-bit
    * box-size path, while decoded VALUES stay layout-independent.
    */
  def synthMp4Media(df: DataFrame): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[Mp4SynthRow].mapPartitions { rows =>
      rows.map { r =>
        val tracks = r.tk_w.zip(r.tk_h).zipWithIndex.map {
          case ((w, h), i) => Mp4Meta.Mp4Track(i + 1L, w, h)
        }
        val payload = Mp4Meta.encode(r.brand, r.timescale, r.duration, tracks,
          mvhdV1 = r.mvhd_v1, tkhdV1 = i => (r.doc_id + i) % 2 == 0)
        MediaRow(r.doc_id, "video/mp4", payload.length.toLong, payload)
      }
    }
  }

  /** One decoded (doc, track) row: movie header fields + this track's
    * dimensions. `duration_ms` is integer-exact (ticks·1000 div
    * timescale) so the row hash-matches a replayed oracle.
    */
  final case class Mp4TrackRow(doc_id: Long, brand: String, timescale: Long,
                               duration_ticks: Long, duration_ms: Long,
                               track_id: Long, width: Int, height: Int)

  /** Per-track container metadata over DECODED ISO-BMFF boxes — one row
    * per (doc, track). Undecodable payloads contribute no rows.
    */
  def mp4TrackMeta(media: Dataset[MediaRow]): Dataset[Mp4TrackRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        Mp4Meta.decode(r.payload).toSeq.flatMap { info =>
          info.tracks.map { t =>
            Mp4TrackRow(r.doc_id, info.majorBrand, info.timescale,
              info.durationTicks,
              Math.floorDiv(info.durationTicks * 1000L, info.timescale),
              t.trackId, t.width, t.height)
          }
        }
      }
    }
  }

  /** Per-row JPEG synthesis parameters for [[synthJpegMedia]]. */
  final case class JpegSynthRow(doc_id: Long, w: Int, h: Int, ncomp: Int,
                                progressive: Boolean)

  /** Encode each row as a structurally valid JFIF marker stream
    * ([[JpegMeta.encode]]) — baseline or progressive SOF varying by
    * row, so a corpus exercises both frame layouts.
    */
  def synthJpegMedia(df: DataFrame): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[JpegSynthRow].mapPartitions { rows =>
      rows.map { r =>
        val payload = JpegMeta.encode(r.w, r.h, r.ncomp, r.progressive)
        MediaRow(r.doc_id, "image/jpeg", payload.length.toLong, payload)
      }
    }
  }

  /** One decoded JPEG frame header. */
  final case class JpegMetaRow(doc_id: Long, width: Int, height: Int,
                               n_components: Int, progressive: Boolean,
                               n_pixels: Long)

  /** Frame metadata over DECODED JPEG marker streams — one row per
    * decodable payload; junk contributes no rows.
    */
  def jpegMeta(media: Dataset[MediaRow]): Dataset[JpegMetaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        JpegMeta.decode(r.payload).map { i =>
          JpegMetaRow(r.doc_id, i.width, i.height, i.nComponents,
            i.progressive, i.width.toLong * i.height)
        }
      }
    }
  }

  /** Synthesize a COMPLETE valid mono 16-bit PCM WAV file from an
    * `array<int>` sample column, as pure codegen'd SQL expressions —
    * RIFF header, fmt chunk, data chunk, two's-complement LE samples.
    * `WavCodec.decode(synthWavPcm16(sr, xs))` returns exactly (sr, xs):
    * the decoder round-trip the q103 oracle checks end-to-end.
    */
  def synthWavPcm16(sampleRate: Column, samples: Column): Column = {
    val n = size(samples)
    val dataSize = n * 2
    // PCM body as ONE hex string per row + a single unhex — a per-sample
    // binary fold costs thousands of interpreted concats per clip (the
    // q146/q235 lesson); little-endian int16 = hex byte pair swapped
    // byte swap ARITHMETICALLY ((v & 255)·256 + (v >> 8)), not by
    // slicing the hex string: transform lambdas evaluate interpreted,
    // and the lpad+2×substring+concat form paid five allocating string
    // ops per sample — the arithmetic form pays one hex + one lpad
    val body = unhex(array_join(
      transform(samples, s => {
        val v = pmod(s.cast("long"), lit(65536L))
        lpad(hex(v.bitwiseAND(lit(255L)) * 256L + shiftright(v, 8)), 4, "0")
      }), ""))
    concat(
      unhex(lit("52494646")), le((dataSize + 36).cast("long"), 4), // "RIFF" + file size
      unhex(lit("57415645")),                                      // "WAVE"
      unhex(lit("666D7420")), le(lit(16L), 4),                     // "fmt " + chunk size
      le(lit(1L), 2), le(lit(1L), 2),                              // PCM, mono
      le(sampleRate.cast("long"), 4),                              // sample rate
      le(sampleRate.cast("long") * 2, 4),                          // byte rate
      le(lit(2L), 2), le(lit(16L), 2),                             // block align, bits
      unhex(lit("64617461")), le(dataSize.cast("long"), 4),        // "data" + size
      body)
  }

  /** A 64-bit image DIFFERENCE HASH as four 16-bit bands — the
    * perceptual fingerprint for visual near-duplicate detection.
    * Band k covers grid rows 2k and 2k+1 (bit position (gy % 2)·8 + gx)
    * and doubles as the BLOCKING key: a near-identical image pair
    * (small Hamming distance) agrees on at least one band by
    * pigeonhole, exactly the SimHash banded-candidate discipline. Four
    * ints also keep the encoding overflow-safe cross-engine (a literal
    * 2⁶³ bit would overflow BIGINT in a SQL replica).
    */
  final case class DHash(doc_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  /** dHash over the DECODED BMP pixels (aHash/dHash/pHash family;
    * dHash = Krawetz's difference hash): integer gray
    * (299·r + 587·g + 114·b) is box-summed onto a 9×8 grid (box (bx,
    * by) = pixels with ⌊x·9/w⌋ = bx, ⌊y·8/h⌋ = by — exact area
    * partition for ANY dimensions), and bit (gx, gy) = 1 iff the mean
    * gray of box (gx, gy) is strictly below its right neighbor,
    * compared EXACTLY by cross-multiplied sums (sumL·nR < sumR·nL — no
    * division, no floats, replayable in any engine). Gradient
    * comparison makes the hash invariant to global brightness shifts —
    * the property that makes it a perceptual hash rather than a
    * checksum. Executor-side at the opaque-codec boundary like every
    * decoder; undecodable payloads and images smaller than the grid
    * (some box empty) contribute no rows.
    */
  def bmpDHash(media: Dataset[MediaRow]): Dataset[DHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        BmpCodec.decode(r.payload).flatMap { bmp =>
          val (gw, gh) = (9, 8)
          val sums = new Array[Long](gw * gh)
          val counts = new Array[Long](gw * gh)
          var y = 0
          while (y < bmp.height) {
            val by = y * gh / bmp.height
            var x = 0
            while (x < bmp.width) {
              val bx = x * gw / bmp.width
              val p = bmp.pixels(y * bmp.width + x)
              val gray = 299L * ((p >> 16) & 0xff) +
                587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
              sums(by * gw + bx) += gray
              counts(by * gw + bx) += 1
              x += 1
            }
            y += 1
          }
          if (counts.exists(_ == 0L)) None // image smaller than the grid
          else {
            val bands = new Array[Int](4)
            var gy = 0
            while (gy < gh) {
              var gx = 0
              while (gx < gw - 1) {
                val l = gy * gw + gx
                val bit = sums(l) * counts(l + 1) < sums(l + 1) * counts(l)
                if (bit) bands(gy / 2) |= 1 << ((gy % 2) * 8 + gx)
                gx += 1
              }
              gy += 1
            }
            Some(DHash(r.doc_id, bands(0), bands(1), bands(2), bands(3)))
          }
        }
      }
    }
  }

  /** AUDIO ENVELOPE dHash — the audio member of the near-dup family
    * (the [[bmpDHash]] discipline applied to decoded PCM): the clip's
    * amplitude envelope is box-summed onto 65 frames (frame f = samples
    * with ⌊i·65/n⌋ = f — exact partition for any length), and bit f =
    * 1 iff frame f's mean |amplitude| is strictly below frame f+1's,
    * compared exactly by cross-multiplied sums. Gradient comparison
    * makes the hash invariant to uniform gain, the audio analogue of
    * dHash's brightness invariance. 64 bits as four 16-bit bands
    * ([[DHash]]), so [[dHashNearDupPairs]] serves audio unchanged.
    * Undecodable payloads and clips shorter than 65 samples contribute
    * no rows.
    */
  def wavEnvelopeDHash(media: Dataset[MediaRow]): Dataset[DHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    val frames = 65
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        WavCodec.decode(r.payload).flatMap { pcm =>
          val n = pcm.samples.length
          if (n < frames) None
          else {
            val sums = new Array[Long](frames)
            val counts = new Array[Long](frames)
            var i = 0
            while (i < n) {
              val f = (i.toLong * frames / n).toInt
              sums(f) += math.abs(pcm.samples(i).toLong)
              counts(f) += 1
              i += 1
            }
            val bands = new Array[Int](4)
            var b = 0
            while (b < frames - 1) {
              if (sums(b) * counts(b + 1) < sums(b + 1) * counts(b))
                bands(b / 16) |= 1 << (b % 16)
              b += 1
            }
            Some(DHash(r.doc_id, bands(0), bands(1), bands(2), bands(3)))
          }
        }
      }
    }
  }

  /** VISUAL NEAR-DUPLICATE PAIRS over dHash bands — the image member of
    * the near-dup family (exact / MinHash / SimHash / embedding):
    * candidates are pairs agreeing on ANY of the four bands (banded
    * blocking — the self-join runs per (band, signature) bucket, never
    * all-pairs; Σ bucket² bounds the quadratic exactly like the SimHash
    * path in [[graft.operators.Dedup]]), survivors have full 64-bit
    * Hamming distance ≤ `maxDist`. PIGEONHOLE: ≤ 3 differing bits over
    * 4 disjoint bands leave at least one band untouched, so blocking is
    * LOSSLESS exactly for maxDist ≤ 3 (distance 4 can place one flip in
    * every band) — the same bound the SimHash near-dup path enforces.
    * Returns (doc_a, doc_b, dist) with doc_a < doc_b.
    */
  def dHashNearDupPairs(h: Dataset[DHash], maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      "4-band blocking guarantees recall only for maxDist <= 3 " +
        s"(pigeonhole over disjoint bands), got $maxDist")
    // the hash frame feeds THREE consumers (band explode + both sides
    // of the distance join) — stage it once or the decode+hash chain
    // upstream recomputes per consumer (the q188 lesson)
    val hd = graft.operators.Staging.stage(h.toDF(), "dhash").df
    val bands = hd.select(col("doc_id"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band", "sig")))
    val cand = bands.as("x").join(bands.as("y"),
      col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val a = hd.select(col("doc_id").as("doc_a"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val b = hd.select(col("doc_id").as("doc_b"), col("b0").as("c0"),
      col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    cand.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .withColumn("dist",
        expr("CAST(bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + " +
          "bit_count(a2 ^ c2) + bit_count(a3 ^ c3) AS INT)"))
      .filter(col("dist") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("dist"))
  }
}
