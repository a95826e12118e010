package graft.core

/** Real MP4 (ISO BMFF) header parsing — major brand, movie timescale, and
  * duration read by walking the top-level box list to `moov/mvhd`, no
  * codec library. Completes the byte-level container-sniff trio
  * ([[ImageHeader]] images, [[AudioHeader]] audio): a multimodal corpus
  * routes video on exactly this metadata — duration buckets, brand
  * filters, sample-clock alignment — without ever touching a decoder.
  * Returns None for foreign/truncated/compressed-header payloads. Both
  * mvhd versions parse: v0 (32-bit times) and v1 (64-bit creation/
  * modification/duration, per ISO 14496-12 §8.2.2 — common in real
  * corpora for long recordings).
  *
  * SECURITY/ROBUSTNESS: box sizes are attacker-controlled unsigned 32-bit
  * values and these sniffers run over UNTRUSTED corpus bytes in executor
  * tasks. All cursors advance in Long arithmetic — a crafted size >= 2^31
  * must never truncate into a negative Int step that walks the cursor
  * backwards forever (hanging the task and its speculative retry). Every
  * loop advances by >= 8 bytes per iteration or returns. mvhd field reads
  * are bounded by the ENCLOSING moov extent, not the whole buffer, so a
  * child box whose declared payload crosses the moov boundary is refused
  * rather than parsed from a neighbor's bytes.
  */
object Mp4Header {

  /** `(brand, timescale, duration, durationMillis, version)` — duration in
    * movie timescale units; millis = duration · 1000 / timescale (integer);
    * version is the mvhd box version (0 or 1) the fields were read from. */
  final case class Mp4(brand: String, timescale: Long, duration: Long,
      durationMillis: Long, version: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xffffffffL
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    (0 until 4).forall(k => b(i + k) == s.charAt(k).toByte)
  private def ascii(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** Boxes are `(size BE32, type 4B, payload)`; `size == 1` means a
    * 64-bit largesize follows (a >4 GB media box — skipped at the top
    * level so a faststart file whose huge `mdat` precedes `moov` in the
    * sniffed bytes still parses; the largesize is as untrusted as any
    * size and walks under the same Long-advance guards), `size == 0`
    * means to-end-of-file (legal only for the LAST box — nothing can
    * follow it, so a to-EOF box that is not `moov` ends the walk). The
    * first box must be `ftyp`; `mvhd` is the first child of `moov`
    * per-spec ordering, but the walk searches the whole child list. */
  def parse(b: Array[Byte]): Option[Mp4] = {
    if (b.length < 16 || !tag(b, 4, "ftyp")) return None
    val brand = ascii(b, 8)
    var i: Long = 0L
    while (i + 8 <= b.length) {
      val at = i.toInt
      val size0 = be32(b, at) // unsigned 32-bit, UNTRUSTED
      val (size, hdr): (Long, Long) =
        if (size0 == 1L) {
          // 64-bit largesize follows the type; reject non-advancing or
          // negative-signed values the same way as crafted 32-bit sizes
          if (i + 16 > b.length) return None
          val ls = be64(b, at + 8)
          if (ls < 16L) return None
          (ls, 16L)
        } else if (size0 == 0L) (b.length - i, 8L) // to end of file
        else if (size0 < 8L) return None
        else (size0, 8L)
      if (tag(b, at + 4, "moov")) {
        var j: Long = i + hdr
        val end: Long = math.min(i + size, b.length.toLong)
        while (j + 8 <= end) {
          val jat = j.toInt
          val cs0 = be32(b, jat)
          // children get the same size grammar as the top level: a
          // largesize child (a huge udta, say) skips under the Long
          // guards; a to-EOF child legally ends the moov's child list
          val cs: Long =
            if (cs0 == 1L) {
              if (j + 16 > end) return None
              val ls = be64(b, jat + 8)
              if (ls < 16L) return None
              ls
            } else if (cs0 == 0L) end - j
            else if (cs0 < 8L) return None
            else cs0
          if (tag(b, jat + 4, "mvhd")) {
            // an mvhd is a fixed ~112-byte FullBox — one declaring a
            // 64-bit largesize is malformed, and its fields would sit at
            // shifted offsets; refuse rather than misread
            if (cs0 == 1L) return None
            // Field reads bounded by BOTH the mvhd box's own extent and
            // the enclosing moov extent — a declared payload crossing
            // either boundary is malformed, not a neighbor's bytes.
            val boxEnd = math.min(j + cs, end)
            // The FullBox version+flags (4 bytes at +8) must fit BEFORE the
            // version byte is read: an mvhd whose 8-byte header is the last
            // thing in the buffer (or in a to-EOF moov) would otherwise
            // read one past the end — an uncaught AIOOBE from untrusted
            // bytes, not the contracted None (ADVICE r10 #1).
            if (j + 12 > boxEnd) return None
            val version = u8(b, jat + 8)
            // v0: version/flags 4B, creation 4B, modification 4B,
            //     timescale @+20 (4B), duration @+24 (4B).
            // v1: creation 8B, modification 8B,
            //     timescale @+28 (4B), duration @+32 (8B).
            return version match {
              case 0 if j + 28 <= boxEnd =>
                val timescale = be32(b, jat + 20)
                val duration = be32(b, jat + 24)
                Some(Mp4(brand, timescale, duration,
                  if (timescale == 0) 0L else duration * 1000L / timescale, 0))
              case 1 if j + 40 <= boxEnd =>
                val timescale = be32(b, jat + 28)
                val duration = be64(b, jat + 32)
                Some(Mp4(brand, timescale, duration,
                  if (timescale == 0) 0L
                  else duration * 1000L / timescale, 1))
              case _ => None
            }
          }
          j += cs // Long: cs >= 8, always advances — crafted sizes exit the loop
        }
        return None // moov without mvhd is malformed
      }
      i += size // Long: size >= 8, always advances
    }
    None
  }

  /** Minimal WELL-FORMED fixture: `ftyp` + a `free` box BEFORE `moov` (so
    * the top-level walk is exercised) + `moov` containing a `free` then
    * the `mvhd` (so the child walk is exercised too). `version` picks the
    * mvhd layout: 0 (32-bit times) or 1 (64-bit times). */
  def synthesize(brand: String, timescale: Long, duration: Long,
      version: Int = 0): Array[Byte] = {
    require(brand.length == 4, "brand is a 4CC")
    require(version == 0 || version == 1, "mvhd version is 0 or 1")
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def w32(v: Long): Unit =
      (3 to 0 by -1).foreach(k => out.write(((v >> (8 * k)) & 0xff).toInt))
    def w64(v: Long): Unit = { w32(v >>> 32); w32(v & 0xffffffffL) }
    w32(16L); w("ftyp"); w(brand); w32(0L) // major brand + minor version
    w32(12L); w("free"); w32(0L)
    // v0 payload: 4 (ver/flags) + 16 (times) + 80; v1: 4 + 28 + 80
    val mvhdSize = 8 + 4 + (if (version == 0) 16 else 28) + 80
    w32(8L + 16L + mvhdSize); w("moov")
    w32(16L); w("free"); w32(0L); w32(0L)
    w32(mvhdSize.toLong); w("mvhd")
    out.write(version); out.write(0); out.write(0); out.write(0) // ver, flags
    if (version == 0) {
      w32(0L); w32(0L) // creation, modification
      w32(timescale); w32(duration)
    } else {
      w64(0L); w64(0L) // creation, modification (64-bit)
      w32(timescale); w64(duration)
    }
    w32(0x00010000L); w32(0x01000000L) // rate 1.0, volume 1.0 + reserved
    (0 until 2).foreach(_ => w32(0L)) // reserved
    Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
      .foreach(w32) // unity matrix
    (0 until 6).foreach(_ => w32(0L)) // pre_defined
    w32(2L) // next_track_ID
    out.toByteArray
  }
}
