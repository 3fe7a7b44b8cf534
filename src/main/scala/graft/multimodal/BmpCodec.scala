package graft.multimodal

/** Pure-JVM BMP (Windows bitmap) decoder for the one raster format that
  * needs no compression library: BITMAPFILEHEADER + BITMAPINFOHEADER,
  * 24-bit BI_RGB pixel data (bottom-up rows, BGR byte order, rows padded
  * to 4 bytes). Everything else (compressed, paletted, top-down) →
  * `None`; every read is bounds-checked so arbitrary bytes never throw —
  * the same executor-side contract as [[WavCodec]].
  */
object BmpCodec {

  /** Decoded image: logical row-major pixels, 0xRRGGBB ints. */
  final case class Bmp(width: Int, height: Int, pixels: Array[Int])

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  def decode(payload: Array[Byte]): Option[Bmp] = {
    if (payload == null || payload.length < 54) return None
    if (payload(0) != 'B' || payload(1) != 'M') return None
    val dataOffset = u32(payload, 10).toInt
    val infoSize = u32(payload, 14).toInt
    if (infoSize < 40) return None
    val width = u32(payload, 18).toInt
    val height = u32(payload, 22).toInt // negative (top-down) unsupported
    val bits = u16(payload, 28)
    val compression = u32(payload, 30)
    if (width < 1 || width > (1 << 20) || height < 1 || height > (1 << 20)) return None
    if (bits != 24 || compression != 0L) return None
    val rowBytes = (width * 3 + 3) / 4 * 4
    if (dataOffset < 54 || dataOffset.toLong + rowBytes.toLong * height > payload.length)
      return None
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      // stored row j holds logical row height-1-j (bottom-up)
      val src = dataOffset + (height - 1 - y) * rowBytes
      var x = 0
      while (x < width) {
        val o = src + 3 * x
        px(y * width + x) = ((payload(o + 2) & 0xff) << 16) |
          ((payload(o + 1) & 0xff) << 8) | (payload(o) & 0xff)
        x += 1
      }
      y += 1
    }
    Some(Bmp(width, height, px))
  }
}
