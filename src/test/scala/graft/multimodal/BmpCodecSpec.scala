package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class BmpCodecSpec extends AnyFunSuite {

  private def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int) = Array(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff,
    (v >> 24) & 0xff).map(_.toByte)

  /** Hand-build a 24-bit BMP from logical row-major RGB ints. */
  private def bmp(w: Int, h: Int, rgb: Seq[Int]): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val data = new Array[Byte](rowBytes * h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = rgb(y * w + x)
      val o = (h - 1 - y) * rowBytes + 3 * x // bottom-up
      data(o) = (p & 0xff).toByte            // B
      data(o + 1) = ((p >> 8) & 0xff).toByte // G
      data(o + 2) = ((p >> 16) & 0xff).toByte// R
    }
    "BM".getBytes("US-ASCII") ++ le32(54 + data.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(data.length) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++ data
  }

  test("decodes a 3x2 image with exact pixel values and logical row order") {
    // distinct per-pixel colors; row 0 is the TOP row logically
    val rgb = Seq(0xff0000, 0x00ff00, 0x0000ff, 0x102030, 0x405060, 0x708090)
    val d = BmpCodec.decode(bmp(3, 2, rgb)).get
    assert(d.width == 3 && d.height == 2)
    assert(d.pixels.toSeq == rgb)
  }

  test("odd widths respect 4-byte row padding") {
    // width 3 → rowBytes 12 (9 + 3 pad); if padding were mishandled the
    // second row's pixels would shift
    val rgb = Seq(1, 2, 3, 4, 5, 6)
    assert(BmpCodec.decode(bmp(3, 2, rgb)).get.pixels.toSeq == rgb)
    val rgb1 = Seq(7, 8) // width 1 → rowBytes 4
    assert(BmpCodec.decode(bmp(1, 2, rgb1)).get.pixels.toSeq == rgb1)
  }

  test("rejects junk, truncation, and unsupported variants without throwing") {
    assert(BmpCodec.decode(null).isEmpty)
    assert(BmpCodec.decode("BMshort".getBytes).isEmpty)
    assert(BmpCodec.decode(Array.fill(100)(0x42.toByte)).isEmpty)
    val ok = bmp(2, 2, Seq(1, 2, 3, 4))
    assert(BmpCodec.decode(ok).isDefined)
    // truncate the pixel data → declared size exceeds payload → None
    assert(BmpCodec.decode(ok.dropRight(5)).isEmpty)
    // 8-bit paletted (bits=8) → unsupported
    val pal = ok.clone(); pal(28) = 8
    assert(BmpCodec.decode(pal).isEmpty)
  }
}
