package graft.multimodal

/** Pure-JVM WAV (RIFF/WAVE) PCM decoder — a REAL media codec with no
  * external library: walks the RIFF chunk list (not fixed offsets, so
  * extra chunks like LIST/INFO between `fmt ` and `data` parse fine),
  * reads the PCM format descriptor, and decodes the sample stream.
  *
  * Supported: audioFormat 1 (integer PCM), 8-bit unsigned and 16-bit
  * signed little-endian, any channel count (samples stay interleaved —
  * frame windows are over the raw sample sequence). Anything else →
  * `None`; `decode` never throws on arbitrary bytes (every read is
  * bounds-checked), which is the contract an executor-side codec must
  * honor on untrusted payloads.
  *
  * Reference semantics: the reference pipeline treats media as opaque
  * URLs (`server/etl.py:163-260` hands torrent payloads around without
  * decoding); the decode stage itself is part of the §7.5
  * training-pipeline extension surface.
  */
object WavCodec {

  /** Decoded PCM: header fields + interleaved integer samples
    * (8-bit decodes centered: stored unsigned byte − 128).
    */
  final case class Pcm(channels: Int, sampleRate: Int, bitsPerSample: Int,
                       samples: Array[Int])

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Decode a WAV PCM payload; `None` for non-WAV / non-PCM /
    * truncated input. The `data` chunk size is clamped to the actual
    * payload length (a truncated final chunk decodes the samples that
    * are present — lenient-load, matching the engine's never-fail
    * ingest posture, SURVEY §2 S4).
    */
  def decode(payload: Array[Byte]): Option[Pcm] = {
    if (payload == null || payload.length < 44) return None
    if (tag(payload, 0) != "RIFF" || tag(payload, 8) != "WAVE") return None
    var fmt: Option[(Int, Int, Int, Int)] = None // format, channels, rate, bits
    var data: Option[(Int, Int)] = None          // offset, length
    var o = 12
    while (o + 8 <= payload.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(payload, o)
      val size = u32(payload, o + 4).toInt
      if (size < 0) return None
      val body = o + 8
      if (id == "fmt " && size >= 16 && body + 16 <= payload.length)
        fmt = Some((u16(payload, body), u16(payload, body + 2),
          u32(payload, body + 4).toInt, u16(payload, body + 14)))
      if (id == "data")
        data = Some((body, math.min(size, payload.length - body)))
      o = body + size + (size & 1) // RIFF chunks pad to even length
    }
    for {
      (format, ch, rate, bits) <- fmt
      if format == 1 && (bits == 8 || bits == 16) && ch >= 1 && rate >= 1
      (off, len) <- data
    } yield {
      val samples: Array[Int] =
        if (bits == 8) Array.tabulate(len)(i => (payload(off + i) & 0xff) - 128)
        else Array.tabulate(len / 2)(i =>
          u16(payload, off + 2 * i).toShort.toInt)
      Pcm(ch, rate, bits, samples)
    }
  }

  /** Strided windows over a decoded sample array — the "frames" of the
    * feature-extract stage. Bounds: ceil(n / stride) windows, each ≤
    * `frameSize` samples.
    */
  def sampleWindows(samples: Array[Int], frameSize: Int, stride: Int): Seq[Array[Int]] = {
    require(frameSize >= 1, s"frameSize must be >= 1, got $frameSize")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    (0 until samples.length by stride)
      .map(off => samples.slice(off, math.min(off + frameSize, samples.length)))
      .filter(_.nonEmpty)
  }

  /** 16-bit LE re-encoding of a sample window (two's complement) — the
    * byte image a frame fingerprint hashes, so fingerprints are defined
    * by sample VALUES, not by container framing.
    */
  def encodeLe16(window: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](window.length * 2)
    var i = 0
    while (i < window.length) {
      out(2 * i) = (window(i) & 0xff).toByte
      out(2 * i + 1) = ((window(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }
}
