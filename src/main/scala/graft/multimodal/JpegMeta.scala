package graft.multimodal

/** Minimal JPEG (JFIF) marker-walk METADATA codec — the fourth member
  * of the multimodal family (WAV decodes samples, BMP/PNG decode
  * pixels, MP4 decodes container metadata; JPEG's entropy-coded scan
  * needs a full Huffman/DCT stack, so the honest pure-JVM decode
  * surface is the MARKER STREAM: frame dimensions, component count,
  * baseline-vs-progressive, JFIF presence). Bounds-checked, never
  * throws on junk — the [[BmpCodec]]/[[WavCodec]]/[[Mp4Meta]] contract.
  *
  * Spec coverage (public ITU-T T.81 / JFIF layout):
  *  - marker = 0xFF + code; fill bytes (repeated 0xFF) are skipped;
  *  - standalone markers (SOI, EOI, RSTn, TEM) carry no length;
  *  - every other segment carries a 16-bit BE length INCLUDING itself;
  *  - SOF0/SOF1 (baseline/extended sequential) and SOF2 (progressive):
  *    precision u8, height u16, width u16, component count u8;
  *  - APP0 with a "JFIF" tag marks a JFIF file;
  *  - the walk stops at the first SOF (metadata complete) or at SOS
  *    with no SOF seen (malformed).
  *
  * Reference scope note: the reference has no media handling (SURVEY
  * §2); this is §7.5 training-pipeline extension surface.
  */
object JpegMeta {

  /** Parsed frame metadata. */
  final case class JpegInfo(width: Int, height: Int, nComponents: Int,
                            progressive: Boolean, jfif: Boolean)

  /** Parse marker-stream metadata; None for anything that is not a
    * well-formed JPEG prefix up to its first SOF marker.
    */
  def decode(b: Array[Byte]): Option[JpegInfo] = {
    if (b == null || b.length < 4) return None
    if ((b(0) & 0xff) != 0xFF || (b(1) & 0xff) != 0xD8) return None
    var off = 2
    var jfif = false
    while (off + 2 <= b.length) {
      if ((b(off) & 0xff) != 0xFF) return None
      // skip fill bytes: any run of 0xFF collapses to one marker prefix
      while (off + 2 <= b.length && (b(off + 1) & 0xff) == 0xFF) off += 1
      if (off + 2 > b.length) return None
      val m = b(off + 1) & 0xff
      if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
        off += 2 // standalone marker, no length
      } else if (m == 0xD9) {
        return None // EOI before any SOF
      } else {
        if (off + 4 > b.length) return None
        val len = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
        if (len < 2 || off + 2 + len > b.length) return None
        if (m == 0xE0 && len >= 7 &&
            b(off + 4) == 'J' && b(off + 5) == 'F' &&
            b(off + 6) == 'I' && b(off + 7) == 'F') jfif = true
        if (m == 0xC0 || m == 0xC1 || m == 0xC2) {
          if (len < 8) return None
          val h = ((b(off + 5) & 0xff) << 8) | (b(off + 6) & 0xff)
          val w = ((b(off + 7) & 0xff) << 8) | (b(off + 8) & 0xff)
          val nc = b(off + 9) & 0xff
          if (w <= 0 || h <= 0 || nc <= 0 || len < 8 + 3 * nc) return None
          return Some(JpegInfo(w, h, nc, progressive = m == 0xC2, jfif = jfif))
        }
        if (m == 0xDA) return None // SOS with no SOF seen
        off += 2 + len
      }
    }
    None
  }

  /** Synthesize a structurally valid JFIF marker stream (SOI, APP0,
    * DQT, SOF0/SOF2, SOS header, entropy stub, EOI). [[decode]] of the
    * result recovers exactly (width, height, nComp, progressive,
    * jfif=true) — the q152 round-trip contract.
    */
  def encode(width: Int, height: Int, nComp: Int, progressive: Boolean): Array[Byte] = {
    require(width > 0 && width <= 0xffff, s"bad width $width")
    require(height > 0 && height <= 0xffff, s"bad height $height")
    require(nComp >= 1 && nComp <= 4, s"bad component count $nComp")
    val bb = new scala.collection.mutable.ArrayBuffer[Byte](96)
    def u8(v: Int): Unit = { bb += v.toByte; () }
    def u16(v: Int): Unit = { u8((v >> 8) & 0xff); u8(v & 0xff) }
    u16(0xFFD8)                                  // SOI
    u16(0xFFE0); u16(16)                         // APP0 JFIF
    "JFIF".getBytes("US-ASCII").foreach(c => u8(c & 0xff)); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    u16(0xFFDB); u16(67); u8(0)                  // DQT, one flat table
    (0 until 64).foreach(_ => u8(16))
    u16(if (progressive) 0xFFC2 else 0xFFC0)     // SOF
    u16(8 + 3 * nComp); u8(8); u16(height); u16(width); u8(nComp)
    (1 to nComp).foreach { c => u8(c); u8(0x11); u8(0) }
    u16(0xFFDA); u16(6 + 2 * nComp); u8(nComp)   // SOS header
    (1 to nComp).foreach { c => u8(c); u8(0) }
    u8(0); u8(63); u8(0)
    u8(0x12); u8(0x34)                           // entropy stub
    u16(0xFFD9)                                  // EOI
    bb.toArray
  }
}
