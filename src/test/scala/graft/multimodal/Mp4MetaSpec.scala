package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class Mp4MetaSpec extends AnyFunSuite {

  private val tracks = Seq(Mp4Meta.Mp4Track(1, 640, 360), Mp4Meta.Mp4Track(2, 1920, 1080))

  test("round-trips all four mvhd/tkhd version layouts") {
    for (mvhdV1 <- Seq(false, true); tkhdOdd <- Seq(false, true)) {
      val bytes = Mp4Meta.encode("isom", 600L, 90000L, tracks,
        mvhdV1 = mvhdV1, tkhdV1 = i => (i % 2 == 0) == tkhdOdd)
      val info = Mp4Meta.decode(bytes).get
      assert(info.majorBrand == "isom")
      assert(info.timescale == 600L && info.durationTicks == 90000L)
      assert(info.tracks == tracks, s"mvhdV1=$mvhdV1 tkhdOdd=$tkhdOdd")
    }
  }

  test("64-bit mvhd duration survives the v1 path") {
    val big = 5000000000L // > Int.MaxValue: only representable in v1
    val info = Mp4Meta.decode(
      Mp4Meta.encode("mp42", 1000L, big, tracks.take(1), mvhdV1 = true, _ => true)).get
    assert(info.durationTicks == big)
    assert(info.majorBrand == "mp42")
  }

  test("walker skips unknown boxes and the largesize mdat") {
    // encode() already interleaves a `free` box before moov and a
    // size==1 (64-bit) mdat after it — decoding proves both are walked
    // over, and moov still parses when it is not the first box
    val bytes = Mp4Meta.encode("isom", 90000L, 123456L, tracks, mvhdV1 = false, _ => false)
    assert(Mp4Meta.decode(bytes).get.tracks.size == 2)
  }

  test("rejects junk, truncation, and corrupt sizes without throwing") {
    assert(Mp4Meta.decode(null).isEmpty)
    assert(Mp4Meta.decode(Array.emptyByteArray).isEmpty)
    assert(Mp4Meta.decode("not an mp4 file at all".getBytes("US-ASCII")).isEmpty)
    val ok = Mp4Meta.encode("isom", 600L, 1L, tracks, mvhdV1 = false, _ => false)
    assert(Mp4Meta.decode(ok).isDefined)
    // truncate mid-moov → walk stops, mvhd never completes → None
    assert(Mp4Meta.decode(ok.take(ok.length / 3)).isEmpty)
    // corrupt a box size to overflow the file bounds → stop, not throw
    val bad = ok.clone(); bad(0) = 0x7f.toByte
    assert(Mp4Meta.decode(bad).isEmpty)
  }

  test("box extending to end-of-file (size==0) parses") {
    // hand-append a size-0 box after a valid container: walker must
    // treat it as 'to EOF' and not loop or throw
    val ok = Mp4Meta.encode("isom", 600L, 42L, tracks.take(1), mvhdV1 = false, _ => false)
    val tail = Array[Byte](0, 0, 0, 0) ++ "skip".getBytes("US-ASCII") ++ Array.fill[Byte](5)(1)
    val info = Mp4Meta.decode(ok ++ tail)
    assert(info.get.durationTicks == 42L)
  }
}
