package graft.multimodal

/** Minimal ISO-BMFF (MP4/MOV/M4A) container METADATA codec — the video
  * member of the multimodal family (WAV decodes samples, BMP/PNG decode
  * pixels; video payloads are opaque compressed streams even in real
  * pipelines, so the honest decode surface is the CONTAINER: brands,
  * movie timescale/duration, per-track dimensions). Pure-JVM box
  * walking, no media library, bounds-checked, never throws on junk —
  * the [[BmpCodec]]/[[WavCodec]] contract.
  *
  * Spec coverage (public ISO/IEC 14496-12 layout):
  *  - box = 32-bit BE size + 4-char type; size==1 → 64-bit largesize
  *    follows; size==0 → box extends to end of file;
  *  - `ftyp` major brand (first 4 payload bytes);
  *  - `moov/mvhd` version 0 (32-bit times: timescale at payload offset
  *    12, duration at 16) AND version 1 (64-bit times: timescale at 20,
  *    duration at 24);
  *  - `moov/trak/tkhd` version 0 (width/height as 16.16 fixed point at
  *    payload offsets 76/80) AND version 1 (at 88/92);
  *  - unknown boxes (`free`, `mdat`, codec-private) are skipped by size.
  *
  * Reference scope note: the reference has no media handling at all
  * (SURVEY §2 — its payloads are CSV/HTML text); this is §7.5
  * training-pipeline extension surface.
  */
object Mp4Meta {

  /** One parsed track header. */
  final case class Mp4Track(trackId: Long, width: Int, height: Int)

  /** Parsed movie-level metadata. */
  final case class Mp4Info(majorBrand: String, timescale: Long,
                           durationTicks: Long, tracks: Seq[Mp4Track])

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)

  private def fourCc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Walk the sibling boxes in `bytes[from, until)` invoking `f(type,
    * payloadStart, payloadEnd)` per box. Malformed sizes terminate the
    * walk instead of throwing or looping.
    */
  private def walk(bytes: Array[Byte], from: Int, until: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var off = from
    while (off + 8 <= until) {
      val size32 = be32(bytes, off)
      val typ = fourCc(bytes, off + 4)
      var payload = off + 8
      val boxEnd: Long =
        if (size32 == 0L) until.toLong // box extends to end of enclosing span
        else if (size32 == 1L) {       // 64-bit largesize
          if (off + 16 > until) return
          payload = off + 16
          off + be64(bytes, off + 8)
        } else off + size32
      if (boxEnd < payload || boxEnd > until) return // corrupt size: stop
      f(typ, payload, boxEnd.toInt)
      off = boxEnd.toInt
    }
  }

  /** Parse container metadata; None when the payload is not ISO-BMFF
    * (no `ftyp`+`moov`) or any required header is truncated.
    */
  def decode(bytes: Array[Byte]): Option[Mp4Info] = {
    if (bytes == null || bytes.length < 16) return None
    var brand: Option[String] = None
    var timescale = -1L
    var duration = -1L
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Mp4Track]
    walk(bytes, 0, bytes.length) {
      case ("ftyp", s, e) =>
        if (e - s >= 4) brand = Some(fourCc(bytes, s))
      case ("moov", ms, me) =>
        walk(bytes, ms, me) {
          case ("mvhd", s, e) =>
            if (e - s >= 4) {
              val v = bytes(s) & 0xff
              if (v == 1 && e - s >= 32) {
                timescale = be32(bytes, s + 20); duration = be64(bytes, s + 24)
              } else if (v == 0 && e - s >= 20) {
                timescale = be32(bytes, s + 12); duration = be32(bytes, s + 16)
              }
            }
          case ("trak", ts, te) =>
            walk(bytes, ts, te) {
              case ("tkhd", s, e) =>
                if (e - s >= 4) {
                  val v = bytes(s) & 0xff
                  val (idOff, whOff, need) = if (v == 1) (20, 88, 96) else (12, 76, 84)
                  if (e - s >= need) {
                    // width/height are 16.16 fixed point; integer part only
                    tracks += Mp4Track(be32(bytes, s + idOff),
                      (be32(bytes, s + whOff) >>> 16).toInt,
                      (be32(bytes, s + whOff + 4) >>> 16).toInt)
                  }
                }
              case _ => ()
            }
          case _ => ()
        }
      case _ => ()
    }
    if (brand.isEmpty || timescale <= 0L || duration < 0L) None
    else Some(Mp4Info(brand.get, timescale, duration, tracks.toSeq))
  }

  // ---- encoder (round-trip test fixture, like PngCodec.encodeRgb) ----

  private def w32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
    out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }
  private def w64(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    w32(out, v >>> 32); w32(out, v & 0xffffffffL)
  }

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    w32(out, payload.length + 8L)
    out.write(typ.getBytes("US-ASCII")); out.write(payload)
    out.toByteArray
  }

  /** Encode a complete valid container: `ftyp` + `free` (walker must
    * skip it) + `moov(mvhd + trak(tkhd)*)` + a LARGESIZE `mdat` (the
    * size==1/64-bit path every real >4 GiB video file uses). mvhd is
    * written as version 1 when `mvhdV1`, each tkhd as version 1 when
    * `tkhdV1(i)` — so a corpus with mixed flags exercises all four
    * header layouts.
    */
  def encode(majorBrand: String, timescale: Long, durationTicks: Long,
             tracks: Seq[Mp4Track], mvhdV1: Boolean,
             tkhdV1: Int => Boolean): Array[Byte] = {
    require(majorBrand.length == 4, s"brand must be 4 chars, got '$majorBrand'")
    val ftyp = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(majorBrand.getBytes("US-ASCII")); w32(o, 0L) // brand + minor version
      o.write(majorBrand.getBytes("US-ASCII"))             // compatible brand
      box("ftyp", o.toByteArray)
    }
    val free = box("free", Array.fill[Byte](12)(0x5a))
    val mvhd = {
      val o = new java.io.ByteArrayOutputStream()
      if (mvhdV1) {
        w32(o, 0x01000000L); w64(o, 0L); w64(o, 0L) // v1 + creation/modification
        w32(o, timescale); w64(o, durationTicks)
      } else {
        w32(o, 0L); w32(o, 0L); w32(o, 0L)
        w32(o, timescale); w32(o, durationTicks)
      }
      w32(o, 0x00010000L); o.write(1); o.write(0)   // rate 1.0, volume 1.0
      o.write(Array.fill[Byte](10)(0))              // reserved
      Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L)
        .foreach(w32(o, _))                          // identity matrix
      o.write(Array.fill[Byte](24)(0))              // pre_defined
      w32(o, tracks.length + 1L)                    // next_track_ID
      box("mvhd", o.toByteArray)
    }
    val traks = tracks.zipWithIndex.map { case (t, i) =>
      val o = new java.io.ByteArrayOutputStream()
      if (tkhdV1(i)) {
        w32(o, 0x01000007L); w64(o, 0L); w64(o, 0L)
        w32(o, t.trackId); w32(o, 0L); w64(o, durationTicks)
      } else {
        w32(o, 0x00000007L); w32(o, 0L); w32(o, 0L)
        w32(o, t.trackId); w32(o, 0L); w32(o, durationTicks)
      }
      o.write(Array.fill[Byte](8)(0))               // reserved
      o.write(0); o.write(0); o.write(0); o.write(0) // layer + alternate_group
      o.write(0); o.write(0); o.write(0); o.write(0) // volume + reserved
      Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L)
        .foreach(w32(o, _))
      w32(o, t.width.toLong << 16); w32(o, t.height.toLong << 16)
      box("trak", box("tkhd", o.toByteArray))
    }
    val moov = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(mvhd); traks.foreach(o.write)
      box("moov", o.toByteArray)
    }
    val mdat = { // largesize form: size==1 + 64-bit size
      val body = Array.fill[Byte](16)(0x2d)
      val o = new java.io.ByteArrayOutputStream()
      w32(o, 1L); o.write("mdat".getBytes("US-ASCII"))
      w64(o, body.length + 16L); o.write(body)
      o.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp); out.write(free); out.write(moov); out.write(mdat)
    out.toByteArray
  }
}
