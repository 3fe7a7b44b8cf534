package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class JpegMetaSpec extends AnyFunSuite {

  test("encode/decode round trip recovers dims, components, progressive, jfif") {
    for {
      (w, h) <- Seq((1, 1), (320, 240), (65535, 1), (16, 9999))
      nc <- Seq(1, 3, 4)
      prog <- Seq(false, true)
    } {
      val got = JpegMeta.decode(JpegMeta.encode(w, h, nc, prog))
      assert(got === Some(JpegMeta.JpegInfo(w, h, nc, prog, jfif = true)))
    }
  }

  test("cross-check against an ImageIO-written REAL JPEG (independent encoder)") {
    val img = new java.awt.image.BufferedImage(37, 23,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 37; y <- 0 until 23) img.setRGB(x, y, (x * 7 + y * 13) << 8)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val got = JpegMeta.decode(bos.toByteArray)
    assert(got.isDefined, "ImageIO JPEG must decode")
    assert(got.get.width == 37 && got.get.height == 23)
    assert(got.get.nComponents == 3)
    assert(!got.get.progressive)
  }

  test("junk, truncation, and non-JPEG payloads never throw, return None") {
    assert(JpegMeta.decode(null).isEmpty)
    assert(JpegMeta.decode(Array[Byte]()).isEmpty)
    assert(JpegMeta.decode(Array[Byte](0x12, 0x34, 0x56, 0x78)).isEmpty)
    // PNG magic
    assert(JpegMeta.decode(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)).isEmpty)
    val ok = JpegMeta.encode(320, 240, 3, progressive = false)
    // every truncation of a valid stream up to its SOF must reject
    for (cut <- 0 until 30) assert(JpegMeta.decode(ok.take(cut)).isEmpty, s"cut=$cut")
    // corrupt a segment length to overrun the buffer
    val bad = ok.clone(); bad(4) = 0x7f.toByte
    assert(JpegMeta.decode(bad).isEmpty)
  }

  test("fill bytes between markers are skipped; EOI-before-SOF rejects") {
    val ok = JpegMeta.encode(8, 8, 1, progressive = false)
    // splice an extra 0xFF fill byte before the APP0 marker
    val filled = (ok.take(2) :+ 0xFF.toByte) ++ ok.drop(2)
    assert(JpegMeta.decode(filled).contains(
      JpegMeta.JpegInfo(8, 8, 1, progressive = false, jfif = true)))
    assert(JpegMeta.decode(Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)).isEmpty)
  }
}
