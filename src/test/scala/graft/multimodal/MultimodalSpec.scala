package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = {
    val df = Seq((1L, "abcdefghij"), (2L, ""), (3L, "xyz")).toDF("doc_id", "txt")
      .withColumn("payload", encode($"txt", "UTF-8"))
    Multimodal.asMediaTable(df, "doc_id", "payload", "text/plain")
  }

  test("asMediaTable carries payload bytes + typed metadata") {
    val rows = media.collect().map(r => r.doc_id -> (r.mime, r.n_bytes)).toMap
    assert(rows(1L) == ("text/plain", 10L))
    assert(rows(2L) == ("text/plain", 0L))
  }

  test("extractFeatures samples deterministic frames per row") {
    val out = Multimodal.extractFeatures(media, frameSize = 4, stride = 4)
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(1L).n_frames == 3)      // 10 bytes / stride 4 → offsets 0,4,8
    assert(out(2L).n_frames == 0)      // empty payload → no frames
    assert(out(3L).n_frames == 1)
    // deterministic: same input → same fingerprints on rerun
    val again = Multimodal.extractFeatures(media, 4, 4)
      .collect().map(f => f.doc_id -> f.frame_fps).toMap
    assert(out(1L).frame_fps == again(1L))
  }

  test("feature extraction is distributed (no driver-side collection)") {
    // shape check: the result is a Dataset whose plan contains the
    // partition-wise map, not a local relation
    val plan = Multimodal.extractFeatures(media, 4, 4).queryExecution
      .executedPlan.toString
    assert(plan.contains("MapPartitions"))
  }

  test("sniffMime identifies containers by magic bytes") {
    val df = Seq(
      "89504E470D0A1A0A0000000D", // png
      "FFD8FFE000104A46",         // jpeg
      "52494646AAAAAAAA57415645", // riff/wave
      "474946383961",             // gif
      "0011223344"                // unknown
    ).toDF("hx")
    val out = df.select(Multimodal.sniffMime(unhex(col("hx"))))
      .as[String].collect()
    assert(out.toSeq === Seq("image/png", "image/jpeg", "audio/wav",
      "image/gif", "application/octet-stream"))
  }

  test("PNG dimensions round-trip through synthesized headers, including multi-byte values") {
    val df = Seq((1L, 640L, 480L), (2L, 70000L, 3L), (3L, 1L, 16777216L))
      .toDF("id", "w", "h")
    val out = df.select(col("id"),
        Multimodal.pngWidth(Multimodal.synthPngHeader(col("w"), col("h"))).as("pw"),
        Multimodal.pngHeight(Multimodal.synthPngHeader(col("w"), col("h"))).as("ph"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out === Map(1L -> ((640L, 480L)), 2L -> ((70000L, 3L)),
      3L -> ((1L, 16777216L))))
  }

  test("wavSampleRate parses the little-endian fmt field") {
    // RIFF....WAVEfmt + chunk size/format/channels, then 44100 Hz as
    // LE bytes 44 AC 00 00 at offsets 25-28
    val wav = "52494646" + "24080000" + "57415645" + "666D7420" +
      "10000000" + "0100" + "0200" + "44AC0000"
    val out = Seq(wav).toDF("hx")
      .select(Multimodal.wavSampleRate(unhex(col("hx"))))
      .as[Option[Long]].collect()
    assert(out.toSeq === Seq(Some(44100L)))
  }

  test("pngWidth is null on non-PNG payloads") {
    val out = Seq("FFD8FFE0").toDF("hx")
      .select(Multimodal.pngWidth(unhex(col("hx"))))
      .as[Option[Long]].collect()
    assert(out.toSeq === Seq(None))
  }
}
