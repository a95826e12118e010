package graft.core

/** Real image-container header parsing — format, width, height read
  * straight from the leading bytes, no codec library. The reference does
  * the same byte-level sniff before any decode: `imgio/imgio.py:42-111`
  * walks JPEG marker segments to the SOF, reads the PNG IHDR, and the GIF
  * logical screen descriptor. Returns None when the payload is not one of
  * the three containers, so callers can fall back to a stub for synthetic
  * payloads (the sandbox test corpus carries text bytes).
  */
object ImageHeader {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** `(format, width, height)` if `b` starts a JPEG/PNG/GIF container. */
  def parse(b: Array[Byte]): Option[(String, Int, Int)] =
    if (b.length >= 24 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a)
      parsePng(b)
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some(("GIF", le16(b, 6), le16(b, 8)))
    else if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8 && u8(b, 2) == 0xff)
      parseJpeg(b)
    else None

  /** PNG: 8-byte signature, then the IHDR chunk is REQUIRED first —
    * 4-byte length, "IHDR", big-endian width and height. */
  private def parsePng(b: Array[Byte]): Option[(String, Int, Int)] =
    if (b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some(("PNG", be32(b, 16), be32(b, 20)))
    else None

  /** JPEG: walk marker segments from SOI until a start-of-frame (any of
    * FFC0–FFCF except the non-frame DHT/JPG/DAC markers C4/C8/CC); the SOF
    * payload is `len(2) precision(1) height(2) width(2) ...`, big-endian.
    * Fill bytes (repeated FF) before a marker id are legal and skipped. */
  private def parseJpeg(b: Array[Byte]): Option[(String, Int, Int)] = {
    var i = 2
    while (i + 1 < b.length) {
      if (u8(b, i) != 0xff) return None // desynchronized — not at a marker
      var j = i + 1
      while (j < b.length && u8(b, j) == 0xff) j += 1 // skip fill bytes
      if (j >= b.length) return None
      val marker = u8(b, j)
      if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        if (j + 7 >= b.length) return None
        return Some(("JPEG", be16(b, j + 6), be16(b, j + 4)))
      } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        i = j + 1 // standalone marker, no length field
      } else if (marker == 0xd9 || marker == 0xda) {
        return None // EOI / entropy-coded scan reached before any SOF
      } else {
        if (j + 2 >= b.length) return None
        i = j + 1 + be16(b, j + 1) // segment length includes its own 2 bytes
      }
    }
    None
  }

  /** Minimal WELL-FORMED containers for fixtures: real headers a byte-level
    * parser must actually read. The JPEG variant carries an APP0 (JFIF) and
    * a COM segment before the SOF0, so the segment walk is exercised, not
    * just a fixed offset. Sizes: PNG 33 B, GIF 13 B, JPEG 44 B. */
  def synthesize(fmt: String, w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def bytes(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
    def wbe16(x: Int): Unit = bytes(x >> 8, x)
    def wbe32(x: Int): Unit = bytes(x >> 24, x >> 16, x >> 8, x)
    fmt match {
      case "PNG" =>
        bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        wbe32(13); bytes('I', 'H', 'D', 'R')
        wbe32(w); wbe32(h)
        bytes(8, 2, 0, 0, 0) // depth, color, compression, filter, interlace
        wbe32(0) // CRC (unchecked by header readers)
      case "GIF" =>
        bytes('G', 'I', 'F', '8', '9', 'a')
        bytes(w, w >> 8, h, h >> 8) // little-endian screen descriptor
        bytes(0, 0, 0) // packed, background, aspect
      case "JPEG" =>
        bytes(0xff, 0xd8) // SOI
        bytes(0xff, 0xe0); wbe16(16) // APP0 JFIF
        bytes('J', 'F', 'I', 'F', 0, 1, 1, 0); wbe16(1); wbe16(1); bytes(0, 0)
        bytes(0xff, 0xfe); wbe16(7); bytes('g', 'r', 'a', 'f', 't') // COM
        bytes(0xff, 0xc0); wbe16(11) // SOF0: len 11 = 2+1+2+2+1+3·ncomp
        bytes(8); wbe16(h); wbe16(w); bytes(1); bytes(1, 0x11, 0)
        bytes(0xff, 0xd9) // EOI
      case other => sys.error(s"unknown format $other")
    }
    out.toByteArray
  }
}
