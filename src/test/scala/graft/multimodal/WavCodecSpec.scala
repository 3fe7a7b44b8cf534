package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** JVM-side codec tests (no Spark session needed): RIFF chunk walking,
  * both PCM widths, leniency on malformed/truncated payloads.
  */
class WavCodecSpec extends AnyFunSuite {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
      .map(_.toByte)
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Hand-build a WAV with optional junk chunk before `data`. */
  private def wav(bits: Int, rate: Int, data: Array[Byte],
                  extraChunk: Boolean = false, dataSizeOverride: Option[Int] = None): Array[Byte] = {
    val fmt = ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(rate) ++
      le32(rate * bits / 8) ++ le16(bits / 8) ++ le16(bits)
    val extra = if (extraChunk) ascii("LIST") ++ le32(5) ++ ascii("INFOX") ++ Array(0.toByte) // odd size → pad byte
      else Array.emptyByteArray
    val dchunk = ascii("data") ++ le32(dataSizeOverride.getOrElse(data.length)) ++ data
    val body = ascii("WAVE") ++ fmt ++ extra ++ dchunk
    ascii("RIFF") ++ le32(body.length) ++ body
  }

  test("decodes 16-bit signed LE PCM, negative values intact") {
    val samples = Seq(0, 1, -1, 32767, -32768, 12345, -12345)
    val p = WavCodec.decode(wav(16, 44100, samples.flatMap(le16(_)).toArray)).get
    assert(p.bitsPerSample == 16 && p.sampleRate == 44100 && p.channels == 1)
    assert(p.samples.toSeq == samples)
  }

  test("decodes 8-bit unsigned PCM centered at -128") {
    val raw = Array[Byte](0, 127.toByte, 128.toByte, 255.toByte)
    val p = WavCodec.decode(wav(8, 8000, raw)).get
    assert(p.samples.toSeq == Seq(-128, -1, 0, 127))
  }

  test("walks past unknown chunks (LIST between fmt and data, odd-size pad)") {
    val samples = Seq(5, -5, 7)
    val p = WavCodec.decode(
      wav(16, 8000, samples.flatMap(le16(_)).toArray, extraChunk = true)).get
    assert(p.samples.toSeq == samples)
  }

  test("clamps a data chunk whose declared size exceeds the payload") {
    val data = Seq(9, 10).flatMap(le16(_)).toArray
    val p = WavCodec.decode(
      wav(16, 8000, data, dataSizeOverride = Some(1000))).get
    assert(p.samples.toSeq == Seq(9, 10))
  }

  test("rejects non-WAV, short, and non-PCM payloads without throwing") {
    assert(WavCodec.decode(null).isEmpty)
    assert(WavCodec.decode(Array.emptyByteArray).isEmpty)
    assert(WavCodec.decode(ascii("RIFF1234WAVE")).isEmpty)
    assert(WavCodec.decode(Array.fill(100)(0x41.toByte)).isEmpty)
    // audioFormat 3 (IEEE float) is declared unsupported → None
    val f = wav(16, 8000, le16(1))
    val fmtOff = 20 // RIFF(4)+size(4)+WAVE(4)+"fmt "(4)+size(4)
    f(fmtOff) = 3
    assert(WavCodec.decode(f).isEmpty)
  }

  test("sampleWindows: strided, tail-truncated, validated") {
    val s = Array(1, 2, 3, 4, 5, 6, 7)
    val w = WavCodec.sampleWindows(s, frameSize = 3, stride = 2)
    assert(w.map(_.toSeq) == Seq(Seq(1, 2, 3), Seq(3, 4, 5), Seq(5, 6, 7), Seq(7)))
    intercept[IllegalArgumentException](WavCodec.sampleWindows(s, 0, 1))
    intercept[IllegalArgumentException](WavCodec.sampleWindows(s, 1, 0))
  }

  test("encodeLe16 round-trips through decode's 16-bit path") {
    val vals = Array(0, -1, 32767, -32768, 255, 256)
    val bytes = WavCodec.encodeLe16(vals)
    val back = Array.tabulate(vals.length)(i =>
      ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt)
    assert(back.toSeq == vals.toSeq)
  }
}
