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

  test("extractFeatures validates frame parameters at construction") {
    intercept[IllegalArgumentException](Multimodal.extractFeatures(media, 0, 4))
    intercept[IllegalArgumentException](Multimodal.extractFeatures(media, 4, 0))
  }

  test("WAV payloads frame over DECODED samples: container width does not change fingerprints") {
    // same sample values shipped as 8-bit and as 16-bit PCM must
    // produce identical frame fingerprints — proof the fingerprint is a
    // function of the decoded audio, not of the byte framing
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff,
      (v >> 24) & 0xff).map(_.toByte)
    def a(s: String) = s.getBytes("US-ASCII")
    def wav(bits: Int, data: Array[Byte]) = {
      val fmt = a("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
        le32(8000 * bits / 8) ++ le16(bits / 8) ++ le16(bits)
      val body = a("WAVE") ++ fmt ++ a("data") ++ le32(data.length) ++ data
      a("RIFF") ++ le32(body.length) ++ body
    }
    val vals = Seq(-100, 0, 55, 127, -128, 3, 9, 1)
    val w8 = wav(8, vals.map(v => (v + 128).toByte).toArray)
    val w16 = wav(16, vals.flatMap(le16).toArray)
    val df = Seq((1L, w8), (2L, w16)).toDF("doc_id", "payload")
    val m = Multimodal.asMediaTable(df, "doc_id", "payload", "audio/wav")
    val fps = Multimodal.extractFeatures(m, frameSize = 4, stride = 4)
      .collect().map(f => f.doc_id -> f.frame_fps).toMap
    assert(fps(1L).nonEmpty && fps(1L) == fps(2L))
  }

  test("wavFrameStats decodes real sample statistics, skips undecodable rows") {
    val df = Seq((7L, "not audio")).toDF("doc_id", "txt")
      .withColumn("payload", encode($"txt", "UTF-8"))
    val opaque = Multimodal.asMediaTable(df, "doc_id", "payload", "text/plain")
    assert(Multimodal.wavFrameStats(opaque, 4, 4).count() == 0)
    val synth = Seq((3L, Seq(10, -20, 30, -40, 50))).toDF("doc_id", "xs")
      .select($"doc_id", Multimodal.synthWavPcm16(lit(16000), $"xs").as("payload"))
    val m = Multimodal.asMediaTable(synth, "doc_id", "payload", "audio/wav")
    val rows = Multimodal.wavFrameStats(m, frameSize = 4, stride = 4)
      .collect().sortBy(_.frame_id)
    assert(rows.length == 2)
    assert(rows(0).sample_rate == 16000 && rows(0).bits == 16)
    assert((rows(0).n_samples, rows(0).s_sum, rows(0).s_min, rows(0).s_max)
      == ((4L, -20L, -40, 30)))
    assert((rows(1).n_samples, rows(1).s_sum, rows(1).s_min, rows(1).s_max)
      == ((1L, 50L, 50, 50)))
  }

  test("wavSilenceSegments merges consecutive active frames, keeps partial tails honest") {
    // frames of 4: [loud, quiet, loud, loud, quiet-tail(2)] →
    // segments {0} and {2,3}; threshold mean|v| >= 1000
    val xs = Seq.fill(4)(2000) ++ Seq.fill(4)(1) ++
      Seq.fill(4)(-3000) ++ Seq.fill(4)(1500) ++ Seq(2, -2)
    val synth = Seq((9L, xs)).toDF("doc_id", "xs")
      .select($"doc_id", Multimodal.synthWavPcm16(lit(8000), $"xs").as("payload"))
    val m = Multimodal.asMediaTable(synth, "doc_id", "payload", "audio/wav")
    val segs = Multimodal.wavSilenceSegments(m, frameSize = 4, thrMilli = 1000000L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(segs == Seq(
      (9L, 0L, 0L, 1L, 8000L),     // 4 × |2000|
      (9L, 2L, 3L, 2L, 18000L)))   // 4 × 3000 + 4 × 1500
    // a partial tail frame LOUD enough must still be active: mean of
    // (5000, 5000) over 2 samples passes where a full-frame sum rule
    // would miss it
    val xs2 = Seq.fill(4)(1) ++ Seq(5000, 5000)
    val m2 = Multimodal.asMediaTable(
      Seq((1L, xs2)).toDF("doc_id", "xs")
        .select($"doc_id", Multimodal.synthWavPcm16(lit(8000), $"xs").as("payload")),
      "doc_id", "payload", "audio/wav")
    val segs2 = Multimodal.wavSilenceSegments(m2, 4, 1000000L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(segs2 == Seq((1L, 1L, 1L, 1L, 10000L)))
  }

  test("pngWidth is null on non-PNG payloads") {
    val out = Seq("FFD8FFE0").toDF("hx")
      .select(Multimodal.pngWidth(unhex(col("hx"))))
      .as[Option[Long]].collect()
    assert(out.toSeq === Seq(None))
  }

  test("resizeNearest: hand cases for down- and up-scale, identity, single pixel") {
    // 2x2 source: [A B; C D] (row-major)
    val src = Array(0xA0, 0xB0, 0xC0, 0xD0)
    // identity
    assert(Multimodal.resizeNearest(src, 2, 2, 2, 2).toSeq === src.toSeq)
    // downscale to 1x1 → top-left (floor rule)
    assert(Multimodal.resizeNearest(src, 2, 2, 1, 1).toSeq === Seq(0xA0))
    // upscale to 4x4 → each source pixel becomes a 2x2 block
    assert(Multimodal.resizeNearest(src, 2, 2, 4, 4).toSeq === Seq(
      0xA0, 0xA0, 0xB0, 0xB0,
      0xA0, 0xA0, 0xB0, 0xB0,
      0xC0, 0xC0, 0xD0, 0xD0,
      0xC0, 0xC0, 0xD0, 0xD0))
    // non-integral ratio: 3 wide → 2 wide picks x2*3/2 = columns 0, 1
    assert(Multimodal.resizeNearest(Array(1, 2, 3), 3, 1, 2, 1).toSeq === Seq(1, 2))
  }
}
