package graft.multimodal

import java.util.zip.{Deflater, Inflater}

/** Pure-JVM PNG decoder: signature + chunk walk, IHDR validation, IDAT
  * concatenation, zlib inflate (`java.util.zip.Inflater` — in the JDK,
  * no media library), and the five PNG scanline filters (None/Sub/Up/
  * Average/Paeth, spec §9). Supported pixel formats: bit depth 8, color
  * types 0 (grayscale), 2 (truecolor RGB) and 6 (RGBA — alpha dropped),
  * non-interlaced. Anything else → `None`; every read is bounds-checked
  * and the inflate is size-capped, so arbitrary / hostile bytes never
  * throw and never balloon memory — the same executor-side contract as
  * [[BmpCodec]] and [[WavCodec]].
  *
  * Reference semantics: PNG spec (RFC 2083 / W3C PNG §9–11) — public
  * format documentation, implemented from scratch.
  */
object PngCodec {

  /** Decoded image: row-major pixels, 0xRRGGBB ints (alpha dropped,
    * grayscale replicated onto all three channels).
    */
  final case class Png(width: Int, height: Int, pixels: Array[Int])

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private val Signature = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Paeth predictor (PNG spec §9.4): nearest of left/up/up-left. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // image-size sanity cap: 1<<20 per side AND <= 64M pixels total, so a
  // forged IHDR can't make the executor allocate unbounded buffers
  private val MaxSide = 1 << 20
  private val MaxPixels = 1L << 26

  def decode(payload: Array[Byte]): Option[Png] = {
    if (payload == null || payload.length < 45) return None // sig+IHDR+IEND minimum
    var i = 0
    while (i < 8) { if (payload(i) != Signature(i)) return None; i += 1 }

    // ---- chunk walk: validate IHDR, concatenate IDAT payloads ----
    var off = 8
    var width = -1; var height = -1; var colorType = -1; var bpp = 0
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && off + 8 <= payload.length) {
      val len = u32(payload, off)
      if (len < 0 || len > Int.MaxValue - 12) return None
      val dataOff = off + 8
      if (dataOff + len + 4 > payload.length) return None // truncated chunk
      val ctype = new String(payload, off + 4, 4, "US-ASCII")
      ctype match {
        case "IHDR" =>
          if (len != 13 || width != -1) return None // exactly one, first
          width = u32(payload, dataOff).toInt
          height = u32(payload, dataOff + 4).toInt
          val bitDepth = payload(dataOff + 8) & 0xff
          colorType = payload(dataOff + 9) & 0xff
          val compression = payload(dataOff + 10) & 0xff
          val filterMethod = payload(dataOff + 11) & 0xff
          val interlace = payload(dataOff + 12) & 0xff
          if (width < 1 || width > MaxSide || height < 1 || height > MaxSide ||
            width.toLong * height > MaxPixels) return None
          if (bitDepth != 8 || compression != 0 || filterMethod != 0 || interlace != 0)
            return None
          bpp = colorType match {
            case 0 => 1 // grayscale
            case 2 => 3 // RGB
            case 6 => 4 // RGBA
            case _ => return None
          }
        case "IDAT" =>
          if (width == -1) return None // IDAT before IHDR
          idat.write(payload, dataOff, len.toInt)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped (CRC not re-verified)
      }
      off = dataOff + len.toInt + 4 // skip data + CRC
    }
    if (!sawEnd || width == -1 || idat.size() == 0) return None

    // ---- inflate, capped at exactly the expected raw size ----
    val rowBytes = width * bpp
    val expected = height * (1 + rowBytes) // each scanline: filter byte + pixels
    val raw = new Array[Byte](expected)
    val inf = new Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < expected && !inf.finished()) {
        val n = inf.inflate(raw, got, expected - got)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        got += n
      }
      if (got < expected) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()

    // ---- undo the per-scanline filters (spec §9: 0..4) ----
    // cur/prev hold UNFILTERED bytes; filters operate on the byte level
    // with `bpp`-byte pixel offsets
    val prev = new Array[Byte](rowBytes)
    val cur = new Array[Byte](rowBytes)
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val base = y * (1 + rowBytes)
      val ft = raw(base) & 0xff
      if (ft > 4) return None
      var x = 0
      while (x < rowBytes) {
        val f = raw(base + 1 + x) & 0xff
        val left = if (x >= bpp) cur(x - bpp) & 0xff else 0
        val up = prev(x) & 0xff
        val upLeft = if (x >= bpp) prev(x - bpp) & 0xff else 0
        val v = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + ((left + up) >> 1)
          case 4 => f + paeth(left, up, upLeft) // a=left, b=up, c=up-left (§9.4)
        }
        cur(x) = (v & 0xff).toByte
        x += 1
      }
      var xi = 0
      while (xi < width) {
        val o = xi * bpp
        val (r, g, b) = colorType match {
          case 0 => val v = cur(o) & 0xff; (v, v, v)
          case _ => (cur(o) & 0xff, cur(o + 1) & 0xff, cur(o + 2) & 0xff)
        }
        px(y * width + xi) = (r << 16) | (g << 8) | b
        xi += 1
      }
      System.arraycopy(cur, 0, prev, 0, rowBytes)
      y += 1
    }
    Some(Png(width, height, px))
  }

  // ---------------------------------------------------------------- encode

  private def crc32(b: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32(); c.update(b); c.getValue
  }

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    val body = ctype.getBytes("US-ASCII") ++ data
    be32(data.length.toLong) ++ body ++ be32(crc32(body))
  }

  /** Encode row-major 0xRRGGBB pixels as a complete, valid RGB PNG —
    * real zlib (`java.util.zip.Deflater`), real CRCs, and a REAL
    * per-scanline filter chosen by `filterOf(y)` (0..4) with the
    * filter arithmetic applied, so a decoder must implement all five
    * inverse filters to get the pixels back. This is the synthesize
    * side of the q115 round trip and of PngCodecSpec; production
    * encoding is not the engine's job.
    */
  def encodeRgb(width: Int, height: Int, pixels: Array[Int],
                filterOf: Int => Int, deflateLevel: Int = 6): Array[Byte] = {
    require(width >= 1 && height >= 1 && pixels.length == width * height,
      s"bad dimensions $width x $height for ${pixels.length} pixels")
    val bpp = 3
    val rowBytes = width * bpp
    val raw = new Array[Byte](height * (1 + rowBytes))
    val prev = new Array[Byte](rowBytes)
    val cur = new Array[Byte](rowBytes)
    var y = 0
    while (y < height) {
      var xi = 0
      while (xi < width) {
        val p = pixels(y * width + xi)
        cur(xi * 3) = ((p >> 16) & 0xff).toByte
        cur(xi * 3 + 1) = ((p >> 8) & 0xff).toByte
        cur(xi * 3 + 2) = (p & 0xff).toByte
        xi += 1
      }
      val ft = filterOf(y) % 5
      val base = y * (1 + rowBytes)
      raw(base) = ft.toByte
      var x = 0
      while (x < rowBytes) {
        val v = cur(x) & 0xff
        val left = if (x >= bpp) cur(x - bpp) & 0xff else 0
        val up = prev(x) & 0xff
        val upLeft = if (x >= bpp) prev(x - bpp) & 0xff else 0
        val f = ft match {
          case 0 => v
          case 1 => v - left
          case 2 => v - up
          case 3 => v - ((left + up) >> 1)
          case 4 => v - paeth(left, up, upLeft)
        }
        raw(base + 1 + x) = (f & 0xff).toByte
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, rowBytes)
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    val def_ = new Deflater(deflateLevel)
    try {
      def_.setInput(raw); def_.finish()
      val buf = new Array[Byte](8192)
      while (!def_.finished()) out.write(buf, 0, def_.deflate(buf))
    } finally def_.end()
    val ihdr = be32(width.toLong) ++ be32(height.toLong) ++
      Array[Byte](8, 2, 0, 0, 0) // depth 8, RGB, deflate, adaptive, no interlace
    Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }
}
