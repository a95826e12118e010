package graft.core

/** Real MP4 (ISO BMFF) header parsing — major brand, movie timescale, and
  * duration read by walking the top-level box list to `moov/mvhd`, no
  * codec library. Completes the byte-level container-sniff trio
  * ([[ImageHeader]] images, [[AudioHeader]] audio): a multimodal corpus
  * routes video on exactly this metadata — duration buckets, brand
  * filters, sample-clock alignment — without ever touching a decoder.
  * Returns None for foreign/truncated/compressed-header payloads.
  */
object Mp4Header {

  /** `(brand, timescale, duration, durationMillis)` — duration in movie
    * timescale units; millis = duration · 1000 / timescale (integer). */
  final case class Mp4(brand: String, timescale: Long, duration: Long,
      durationMillis: Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xffffffffL
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    (0 until 4).forall(k => b(i + k) == s.charAt(k).toByte)
  private def ascii(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** Boxes are `(size BE32, type 4B, payload)`; `size == 1` means a
    * 64-bit largesize follows (unsupported here — a header sniff works on
    * prefixes well under 4 GB), `size == 0` means to-end-of-file. The
    * first box must be `ftyp`; `mvhd` is the first child of `moov`
    * per-spec ordering, but the walk searches the whole child list. */
  def parse(b: Array[Byte]): Option[Mp4] = {
    if (b.length < 16 || !tag(b, 4, "ftyp")) return None
    val brand = ascii(b, 8)
    var i = 0
    while (i + 8 <= b.length) {
      val size = be32(b, i)
      if (size < 8) return None // largesize/to-eof — not a sniffable prefix
      if (tag(b, i + 4, "moov")) {
        var j = i + 8
        val end = math.min(i + size, b.length.toLong).toInt
        while (j + 8 <= end) {
          val cs = be32(b, j)
          if (cs < 8) return None
          if (tag(b, j + 4, "mvhd")) {
            val version = u8(b, j + 8)
            if (version != 0 || j + 8 + 24 > b.length) return None
            val timescale = be32(b, j + 20)
            val duration = be32(b, j + 24)
            return Some(Mp4(brand, timescale, duration,
              if (timescale == 0) 0L else duration * 1000L / timescale))
          }
          j += cs.toInt
        }
        return None // moov without mvhd is malformed
      }
      i += size.toInt
    }
    None
  }

  /** Minimal WELL-FORMED fixture: `ftyp` + a `free` box BEFORE `moov` (so
    * the top-level walk is exercised) + `moov` containing a `free` then
    * the v0 `mvhd` (so the child walk is exercised too). */
  def synthesize(brand: String, timescale: Long, duration: Long): Array[Byte] = {
    require(brand.length == 4, "brand is a 4CC")
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def w32(v: Long): Unit =
      (3 to 0 by -1).foreach(k => out.write(((v >> (8 * k)) & 0xff).toInt))
    w32(16L); w("ftyp"); w(brand); w32(0L) // major brand + minor version
    w32(12L); w("free"); w32(0L)
    val mvhdSize = 8 + 4 + 96 // header + version/flags + v0 payload
    w32(8L + 16L + mvhdSize); w("moov")
    w32(16L); w("free"); w32(0L); w32(0L)
    w32(mvhdSize.toLong); w("mvhd"); w32(0L) // version 0, flags 0
    w32(0L); w32(0L) // creation, modification
    w32(timescale); w32(duration)
    w32(0x00010000L); w32(0x01000000L) // rate 1.0, volume 1.0 + reserved
    (0 until 2).foreach(_ => w32(0L)) // reserved
    Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
      .foreach(w32) // unity matrix
    (0 until 6).foreach(_ => w32(0L)) // pre_defined
    w32(2L) // next_track_ID
    out.toByteArray
  }
}
