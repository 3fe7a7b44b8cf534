package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Image perceptual near-dup: dHash properties (brightness invariance,
  * locality under small perturbations, ragged-grid exactness) and the
  * banded pair generation.
  */
class DHashSpec extends SparkSpec {
  import spark.implicits._

  /** Synthesize a BMP from a pixel function over (x, y). */
  private def bmpOf(id: Long, w: Int, h: Int, px: (Int, Int) => Int) = {
    val pixels = (0 until w * h).map(i => px(i % w, i / w))
    (id, w, h, pixels)
  }

  private def mediaOf(imgs: Seq[(Long, Int, Int, Seq[Int])]) = {
    val df = imgs.toDF("doc_id", "w", "h", "pixels")
      .withColumn("payload", Multimodal.synthBmp24(col("w"), col("h"),
        expr("""
          aggregate(
            transform(sequence(0, h - 1), j ->
              concat(
                aggregate(
                  transform(sequence(0, w - 1), x -> concat(
                    unhex(lpad(hex(pixels[(h - 1 - j) * w + x] % 256), 2, '0')),
                    unhex(lpad(hex((pixels[(h - 1 - j) * w + x] div 256) % 256), 2, '0')),
                    unhex(lpad(hex((pixels[(h - 1 - j) * w + x] div 65536) % 256), 2, '0')))),
                  X'', (acc, e) -> concat(acc, e)),
                substring(unhex('00000000'), 1, (4 - (w * 3) % 4) % 4))),
            X'', (acc, e) -> concat(acc, e))""")))
    Multimodal.asMediaTable(df, "doc_id", "payload", "image/bmp")
  }

  private def gray(v: Int) = (v << 16) | (v << 8) | v

  test("dHash: identical images hash equal; global brightness shift is " +
    "invariant; a strong pattern change diverges") {
    def pattern(x: Int, y: Int) = gray((x * x * 3 + y * 7 + x * y) % 180)
    val imgs = Seq(
      bmpOf(1L, 18, 16, pattern),
      bmpOf(2L, 18, 16, pattern), // identical
      bmpOf(3L, 18, 16, (x, y) => gray(((pattern(x, y) & 0xff) + 40) % 256 match {
        case v if v < (pattern(x, y) & 0xff) => (pattern(x, y) & 0xff) // avoid wrap
        case v => v
      })), // +40 brightness, no wrap
      bmpOf(4L, 18, 16, (x, y) => gray((200 - x * 11 + y * 2).max(0) % 200)))
    val h = Multimodal.bmpDHash(mediaOf(imgs)).collect().map(d => d.doc_id -> d).toMap
    assert(h(1L).copy(doc_id = 0) == h(2L).copy(doc_id = 0))
    assert(h(1L).copy(doc_id = 0) == h(3L).copy(doc_id = 0),
      "uniform brightness shift must not change gradient signs")
    assert(h(1L).copy(doc_id = 0) != h(4L).copy(doc_id = 0))
  }

  test("dHash ragged grid (w, h not divisible by 9, 8) matches a " +
    "brute-force reference") {
    def pattern(x: Int, y: Int) = gray((x * 13 + y * 29 + x * x) % 211)
    val (w, h) = (23, 17)
    val got = Multimodal.bmpDHash(mediaOf(Seq(bmpOf(9L, w, h, pattern))))
      .collect().head
    // reference: same definition, independent code path
    val sums = Array.fill(9 * 8)(0L); val cnts = Array.fill(9 * 8)(0L)
    for (y <- 0 until h; x <- 0 until w) {
      val b = (y * 8 / h) * 9 + (x * 9 / w)
      sums(b) += 1000L * (pattern(x, y) & 0xff); cnts(b) += 1
    }
    val bands = Array.fill(4)(0)
    for (gy <- 0 until 8; gx <- 0 until 8) {
      val l = gy * 9 + gx
      if (sums(l) * cnts(l + 1) < sums(l + 1) * cnts(l))
        bands(gy / 2) |= 1 << ((gy % 2) * 8 + gx)
    }
    assert((got.b0, got.b1, got.b2, got.b3) ==
      (bands(0), bands(1), bands(2), bands(3)))
  }

  test("wavEnvelopeDHash: identical clips hash equal; uniform gain is " +
    "invariant; a different envelope differs; short clips drop") {
    def clip(id: Long, f: Int => Int) = (id, (0 until 1040).map(f))
    val clips = Seq(
      clip(1L, i => (i * i * 3 + i * 7) % 12000),
      clip(2L, i => (i * i * 3 + i * 7) % 12000),          // identical
      clip(3L, i => ((i * i * 3 + i * 7) % 12000) * 2),     // gain ×2, < 32768
      clip(4L, i => (11999 - (i * i * 3 + i * 7) % 12000)), // inverted envelope
      (5L, (0 until 32).map(_ * 100)))                      // shorter than 65 frames
    val df = clips.toDF("doc_id", "samples")
      .withColumn("payload", Multimodal.synthWavPcm16(lit(8000),
        expr("transform(samples, s -> CAST(s AS INT))")))
    val media = Multimodal.asMediaTable(df, "doc_id", "payload", "audio/wav")
    val h = Multimodal.wavEnvelopeDHash(media).collect()
      .map(d => d.doc_id -> d).toMap
    assert(h.keySet == Set(1L, 2L, 3L, 4L), "short clip must drop")
    assert(h(1L).copy(doc_id = 0) == h(2L).copy(doc_id = 0))
    assert(h(1L).copy(doc_id = 0) == h(3L).copy(doc_id = 0),
      "uniform gain must not change envelope gradient signs")
    assert(h(1L).copy(doc_id = 0) != h(4L).copy(doc_id = 0))
  }

  test("dHashNearDupPairs: perturbed variant pairs with its original; " +
    "unrelated image does not; images below grid size drop") {
    def pattern(x: Int, y: Int) = gray((x * x * 5 + y * 9 + 3 * x * y) % 190)
    val imgs = Seq(
      bmpOf(1L, 18, 16, pattern),
      // one-pixel perturbation — a near-duplicate
      bmpOf(2L, 18, 16, (x, y) =>
        if (x == 5 && y == 7) gray(((pattern(x, y) & 0xff) + 4) % 256)
        else pattern(x, y)),
      // unrelated
      bmpOf(3L, 18, 16, (x, y) => gray((x * 31 + (15 - y) * 47 + x * y * 3) % 160)),
      // smaller than the 9x8 grid — must contribute no hash
      bmpOf(4L, 4, 3, pattern))
    val hashes = Multimodal.bmpDHash(mediaOf(imgs))
    assert(hashes.collect().map(_.doc_id).toSet == Set(1L, 2L, 3L))
    val pairs = Multimodal.dHashNearDupPairs(hashes, maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 <= 3),
      s"near-identical pair missing: $pairs")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L),
      s"unrelated image paired: $pairs")
  }
}
