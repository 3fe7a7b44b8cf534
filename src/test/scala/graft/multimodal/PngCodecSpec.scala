package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

class PngCodecSpec extends AnyFunSuite {

  /** Deterministic pixel generator (same shape as the q111/q115 one). */
  private def pix(seed: Long, w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val r = ((seed * 7 + x * 19 + y * 23) % 256).toInt
      val g = ((seed * 5 + x * 13 + y * 17) % 256).toInt
      val b = ((seed * 3 + x * 7 + y * 11) % 256).toInt
      (r << 16) | (g << 8) | b
    }

  test("encode/decode round trip, every filter type, several dims and deflate levels") {
    for (ft <- 0 to 4; (w, h) <- Seq((1, 1), (3, 7), (8, 5), (17, 9)); lvl <- Seq(0, 6, 9)) {
      val p = pix(ft * 100 + w, w, h)
      val png = PngCodec.encodeRgb(w, h, p, _ => ft, deflateLevel = lvl)
      val got = PngCodec.decode(png)
      assert(got.isDefined, s"filter $ft ${w}x$h level $lvl must decode")
      assert(got.get.width == w && got.get.height == h)
      assert(got.get.pixels.toSeq == p.toSeq, s"filter $ft ${w}x$h level $lvl pixels")
    }
    // cycling filters (the q115 shape: every row a different filter)
    val p = pix(42, 6, 10)
    val png = PngCodec.encodeRgb(6, 10, p, y => y % 5)
    assert(PngCodec.decode(png).get.pixels.toSeq == p.toSeq)
  }

  test("CROSS-CHECK vs ImageIO: decode a PNG written by the JDK's own encoder") {
    // ImageIO's PNG writer is an independent implementation — real
    // deflate, its own filter heuristics — so agreement here can't come
    // from a symmetric encode/decode bug in this codec.
    for ((w, h) <- Seq((5, 4), (16, 16), (33, 7))) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val p = pix(w * 31 + h, w, h)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, p(y * w + x))
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "png", out))
      val got = PngCodec.decode(out.toByteArray)
      assert(got.isDefined, s"ImageIO ${w}x$h PNG must decode")
      assert(got.get.width == w && got.get.height == h)
      assert(got.get.pixels.toSeq == p.toSeq, s"ImageIO ${w}x$h pixel mismatch")
    }
  }

  test("CROSS-CHECK vs ImageIO: grayscale and RGBA color types") {
    val w = 9; val h = 6
    val gray = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 29 + y * 53) % 256
      gray.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val go = new ByteArrayOutputStream(); ImageIO.write(gray, "png", go)
    val g = PngCodec.decode(go.toByteArray)
    assert(g.isDefined && g.get.width == w && g.get.height == h)
    // compare RAW gray samples (getRGB would add TYPE_BYTE_GRAY's
    // linear→sRGB conversion; the PNG stores the raw sample byte)
    for (y <- 0 until h; x <- 0 until w) {
      val v = gray.getRaster.getSample(x, y, 0)
      assert(g.get.pixels(y * w + x) == ((v << 16) | (v << 8) | v))
    }

    val argb = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    val p = pix(77, w, h)
    for (y <- 0 until h; x <- 0 until w) argb.setRGB(x, y, 0xff000000 | p(y * w + x))
    val ao = new ByteArrayOutputStream(); ImageIO.write(argb, "png", ao)
    val a = PngCodec.decode(ao.toByteArray)
    assert(a.isDefined, "RGBA PNG must decode (alpha dropped)")
    assert(a.get.pixels.toSeq == p.toSeq)
  }

  test("junk and malformed payloads return None, never throw") {
    assert(PngCodec.decode(null).isEmpty)
    assert(PngCodec.decode(Array.emptyByteArray).isEmpty)
    assert(PngCodec.decode(Array.fill[Byte](200)(0x41)).isEmpty)
    val good = PngCodec.encodeRgb(4, 4, pix(1, 4, 4), _ => 2)
    assert(PngCodec.decode(good).isDefined)
    // every truncation of a valid file fails cleanly
    for (cut <- Seq(4, 8, 20, 33, good.length - 5))
      assert(PngCodec.decode(good.take(cut)).isEmpty, s"truncate at $cut")
    // corrupt the IDAT zlib stream: flip a byte mid-stream
    val corrupt = good.clone(); corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x5a).toByte
    assert(PngCodec.decode(corrupt).isEmpty || PngCodec.decode(corrupt).isDefined) // must not throw
    // forged IHDR claiming a giant image must be rejected before allocating
    val forged = good.clone()
    forged(16) = 0x7f.toByte // width high byte → ~2^31
    assert(PngCodec.decode(forged).isEmpty)
  }

  test("interlaced / 16-bit / paletted PNGs are declined (None), not misdecoded") {
    // hand-build an IHDR with interlace=1 from a valid file's prefix
    val good = PngCodec.encodeRgb(4, 4, pix(9, 4, 4), _ => 0)
    val interlaced = good.clone()
    interlaced(8 + 4 + 4 + 12) = 1 // IHDR interlace byte (sig + len + type + 12)
    assert(PngCodec.decode(interlaced).isEmpty)
    val deep = good.clone()
    deep(8 + 4 + 4 + 8) = 16 // bit depth byte
    assert(PngCodec.decode(deep).isEmpty)
  }
}
