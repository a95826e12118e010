package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.AudioHeader
import graft.core.Mp4Header

/** Byte-level WAV/MP4 sniffing edge cases the oracle's arithmetic twin
  * cannot see: rejection of foreign/truncated payloads, odd-size chunk
  * padding, header-prefix (dataless) parsing, non-PCM passthrough, mvhd
  * v1, and — critically — TERMINATION on adversarial crafted sizes. These
  * parsers run over untrusted corpus bytes inside executor tasks; a size
  * field near 2^32 truncated to a negative Int once froze the cursor
  * (infinite loop). Every crafted fixture here must return None, fast. */
class AudioHeaderSpec extends AnyFunSuite {

  test("synthesized PCM WAV round-trips every field") {
    val b = AudioHeader.synthesize(channels = 2, sampleRate = 44100,
      bits = 16, dataBytes = 44100 * 4) // exactly one second
    val w = AudioHeader.parse(b).get
    assert(w.format == AudioHeader.PcmFormat)
    assert(w.channels == 2 && w.sampleRate == 44100 && w.bits == 16)
    assert(w.dataBytes == 44100L * 4)
    assert(w.durationMicros.contains(1000000L))
  }

  test("foreign and truncated payloads are rejected, not mis-parsed") {
    assert(AudioHeader.parse("not audio at all".getBytes).isEmpty)
    assert(AudioHeader.parse(Array.emptyByteArray).isEmpty)
    val good = AudioHeader.synthesize(1, 8000, 16, 64)
    assert(AudioHeader.parse(good.take(10)).isEmpty) // inside the RIFF header
    // ImageHeader containers must not parse as audio and vice versa
    val png = graft.core.ImageHeader.synthesize("PNG", 10, 10)
    assert(AudioHeader.parse(png).isEmpty)
    assert(graft.core.ImageHeader.parse(good).isEmpty)
  }

  test("a header PREFIX (no data payload bytes) still yields the metadata") {
    val full = AudioHeader.synthesize(2, 16000, 16, 4096)
    // keep everything through the data chunk HEADER, drop the payload —
    // the streaming-sniff case: size comes from the header, not the bytes
    val prefix = full.take(full.length - 4096)
    val w = AudioHeader.parse(prefix).get
    assert(w.dataBytes == 4096L)
    assert(w.durationMicros.contains(4096L * 1000000 / (16000L * 4)))
  }

  test("odd-sized unknown chunks are pad-skipped per RIFF") {
    // hand-build: RIFF/WAVE + 3-byte junk chunk (padded to 4) + fmt + data
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit =
      (0 until 4).foreach(k => out.write(((v >> (8 * k)) & 0xff).toInt))
    w("RIFF"); w32(4 + 12 + 24 + 8); w("WAVE")
    w("junk"); w32(3L); out.write(Array[Byte](1, 2, 3, 0)) // 3 + pad
    w("fmt "); w32(16L); w16(1); w16(1); w32(8000L); w32(16000L); w16(2); w16(16)
    w("data"); w32(0L)
    val parsed = AudioHeader.parse(out.toByteArray)
    assert(parsed.exists(p => p.sampleRate == 8000 && p.channels == 1))
  }

  test("MP4 sniff walks both box levels and rejects foreign payloads") {
    val b = Mp4Header.synthesize("isom", 90000L, 90000L * 3)
    val m = Mp4Header.parse(b).get
    assert(m.brand == "isom" && m.timescale == 90000L)
    assert(m.durationMillis == 3000L)
    assert(Mp4Header.parse("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Mp4Header.parse(b.take(20)).isEmpty) // inside ftyp — no moov yet
    assert(AudioHeader.parse(b).isEmpty) // the trio never cross-parses
    val wav = AudioHeader.synthesize(1, 8000, 16, 8)
    assert(Mp4Header.parse(wav).isEmpty)
  }

  test("non-PCM fmt passes through format metadata but withholds duration") {
    val b = AudioHeader.synthesize(1, 8000, 16, 32)
    // fmt audioFormat field sits right after "fmt " + size: flip PCM(1) → 2
    val i = (0 until b.length - 4).find(k =>
      b(k) == 'f' && b(k + 1) == 'm' && b(k + 2) == 't' && b(k + 3) == ' ').get
    b(i + 8) = 2
    // The routing metadata (format code, channels, rate, payload size) is
    // still in the header; only the duration needs a codec, so only it is
    // withheld — a corpus routes compressed audio instead of dropping it.
    val w = AudioHeader.parse(b).get
    assert(w.format == 2 && w.channels == 1 && w.sampleRate == 8000)
    assert(w.dataBytes == 32L)
    assert(w.durationMicros.isEmpty)
  }

  test("WAVE_FORMAT_EXTENSIBLE resolves the real format from the SubFormat GUID") {
    // hand-build a 40-byte extensible fmt whose SubFormat is PCM (0x0001):
    // the parser must surface format=1 WITH the header-exact duration
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit =
      (0 until 4).foreach(k => out.write(((v >> (8 * k)) & 0xff).toInt))
    w("RIFF"); w32(4 + 48 + 8); w("WAVE")
    w("fmt "); w32(40L)
    w16(0xFFFE); w16(2); w32(48000L); w32(48000L * 8); w16(8); w16(32)
    w16(22); w16(32); w32(0x3L) // cbSize, validBits, channelMask
    w16(1); w16(0) // SubFormat GUID: PCM (0x0001) + start of the fixed tail
    w32(0x00100000L); w32(0x80000080L); w32(0x00719b38L) // KSDATAFORMAT tail
    w("data"); w32(48000L * 8 / 2) // half a second
    val wv = AudioHeader.parse(out.toByteArray).get
    assert(wv.format == 1 && wv.channels == 2 && wv.bits == 32)
    assert(wv.durationMicros.contains(500000L))
    // an extensible NON-PCM SubFormat still routes, duration withheld
    val bytes = out.toByteArray
    bytes(20 + 24) = 3 // SubFormat -> IEEE float (0x0003)
    val wf = AudioHeader.parse(bytes).get
    assert(wf.format == 3 && wf.durationMicros.isEmpty)
  }

  test("mvhd version 1 (64-bit times) parses with the v1 field offsets") {
    // long recordings commonly carry v1 headers; duration here exceeds
    // 2^32 timescale units, unrepresentable in a v0 box at all
    val dur = (1L << 33) + 12345L
    val b = Mp4Header.synthesize("mp42", 48000L, dur, version = 1)
    val m = Mp4Header.parse(b).get
    assert(m.brand == "mp42" && m.timescale == 48000L)
    assert(m.duration == dur)
    assert(m.durationMillis == dur * 1000L / 48000L)
    // and the v0 round-trip still holds with the shared builder
    assert(Mp4Header.parse(Mp4Header.synthesize("isom", 600L, 1200L))
      .exists(_.durationMillis == 2000L))
  }

  // ---- adversarial crafted-size fixtures: must TERMINATE with None ----
  // A RIFF chunk size of 0xFFFFFFF8 once became toInt = -8 → advance 0 →
  // infinite loop; an MP4 box size >= 2^31 became a negative Int step →
  // cursor walked backwards forever. Long-cursor arithmetic makes every
  // iteration advance >= 8 bytes, so these all fall out of the walk.

  private def timed[A](body: => A): A = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future(body), 10.seconds)
  }

  test("RIFF chunk size 0xFFFFFFF8 terminates with None (no frozen cursor)") {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def w32(v: Long): Unit =
      (0 until 4).foreach(k => out.write(((v >> (8 * k)) & 0xff).toInt))
    w("RIFF"); w32(0xFFFFFFFFL); w("WAVE")
    w("junk"); w32(0xFFFFFFF8L) // toInt would be -8: advance-by-zero trap
    assert(timed(AudioHeader.parse(out.toByteArray)).isEmpty)
  }

  test("RIFF fmt chunk with crafted huge size terminates with None") {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def w32(v: Long): Unit =
      (0 until 4).foreach(k => out.write(((v >> (8 * k)) & 0xff).toInt))
    w("RIFF"); w32(0xFFFFFFFFL); w("WAVE")
    w("fmt "); w32(0x80000010L); out.write(new Array[Byte](16))
    assert(timed(AudioHeader.parse(out.toByteArray)).isEmpty)
  }

  test("MP4 top-level box size 0x80000000 terminates with None") {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def w32(v: Long): Unit =
      (3 to 0 by -1).foreach(k => out.write(((v >> (8 * k)) & 0xff).toInt))
    w32(16L); w("ftyp"); w("isom"); w32(0L)
    w32(0x80000000L); w("free") // toInt would be negative: backwards walk
    assert(timed(Mp4Header.parse(out.toByteArray)).isEmpty)
  }

  test("MP4 child box size >= 2^31 inside moov terminates with None") {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def w32(v: Long): Unit =
      (3 to 0 by -1).foreach(k => out.write(((v >> (8 * k)) & 0xff).toInt))
    w32(16L); w("ftyp"); w("isom"); w32(0L)
    w32(24L); w("moov")
    w32(0xFFFFFFF0L); w("free"); w32(0L); w32(0L)
    assert(timed(Mp4Header.parse(out.toByteArray)).isEmpty)
  }

  test("largesize and to-EOF boxes walk correctly; crafted largesize terminates") {
    def w32of(out: java.io.ByteArrayOutputStream, v: Long): Unit =
      (3 to 0 by -1).foreach(k => out.write(((v >> (8 * k)) & 0xff).toInt))
    def w64of(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
      w32of(out, v >>> 32); w32of(out, v & 0xffffffffL)
    }
    // the faststart-with-huge-media shape: ftyp, then a LARGESIZE box
    // (size field 1 + 64-bit total), then a to-EOF moov (size field 0) —
    // both the 64-bit skip and the last-box semantics must walk
    val good = Mp4Header.synthesize("isom", 600L, 1200L)
    val moovAt = good.length - 132 // moov box is the synthesized tail
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    w32of(out, 16L); w("ftyp"); w("isom"); w32of(out, 0L)
    w32of(out, 1L); w("free"); w64of(out, 24L) // largesize box: 16 hdr + 8 payload
    w64of(out, 0L)
    out.write(good, moovAt, 132) // the moov...
    val withLarge = out.toByteArray
    withLarge(16 + 24) = 0; withLarge(16 + 24 + 1) = 0
    withLarge(16 + 24 + 2) = 0; withLarge(16 + 24 + 3) = 0 // moov size -> 0 (to-EOF)
    val m = Mp4Header.parse(withLarge).get
    assert(m.timescale == 600L && m.durationMillis == 2000L)
    // crafted largesize: sign bit set -> refused; absurd-huge -> walks out
    val bad = withLarge.clone()
    bad(16 + 8) = 0x80.toByte // largesize 0x80000000…
    assert(timed(Mp4Header.parse(bad)).isEmpty)
    val far = withLarge.clone()
    far(16 + 9) = 0x7f.toByte // largesize ~2^54: jumps past the buffer
    assert(timed(Mp4Header.parse(far)).isEmpty)

    // a LARGESIZE CHILD inside moov (a huge udta, say) is skipped, and
    // the mvhd after it still parses
    val out2 = new java.io.ByteArrayOutputStream()
    def w2(s: String): Unit = out2.write(s.getBytes("US-ASCII"))
    w32of(out2, 16L); w2("ftyp"); w2("mp42"); w32of(out2, 0L)
    w32of(out2, 0L); w2("moov") // to-EOF moov
    w32of(out2, 1L); w2("udta"); w64of(out2, 24L); w64of(out2, 0L) // largesize child
    val mvhdAt = good.length - 108
    out2.write(good, mvhdAt, 108)
    val m2 = Mp4Header.parse(out2.toByteArray).get
    assert(m2.brand == "mp42" && m2.timescale == 600L && m2.duration == 1200L)
  }

  test("truncated moov (declared size past the buffer) yields None") {
    val good = Mp4Header.synthesize("isom", 1000L, 5000L)
    // cut inside the moov child list, before mvhd's fields are reachable
    assert(timed(Mp4Header.parse(good.take(good.length - 90))).isEmpty)
  }

  test("mvhd header as the FINAL 8 buffer bytes yields None, not AIOOBE") {
    // ADVICE r10 #1: the version byte sits at +8 of the child header; an
    // mvhd whose 8-byte header ends exactly at the buffer end (j+8 == end
    // == b.length) used to read b(b.length) before any bounds check —
    // an uncaught ArrayIndexOutOfBoundsException from untrusted bytes,
    // violating the must-return-None contract for crafted input.
    def w32of(out: java.io.ByteArrayOutputStream, v: Long): Unit =
      (3 to 0 by -1).foreach(k => out.write(((v >> (8 * k)) & 0xff).toInt))
    // (a) moov declaring exactly one 8-byte child, buffer ends there
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    w32of(out, 16L); w("ftyp"); w("isom"); w32of(out, 0L)
    w32of(out, 16L); w("moov")
    w32of(out, 8L); w("mvhd") // size-8 child header IS the last 8 bytes
    assert(timed(Mp4Header.parse(out.toByteArray)).isEmpty)
    // (b) to-EOF moov (size 0) whose last 8 bytes are size=8,'mvhd'
    val out2 = new java.io.ByteArrayOutputStream()
    def w2(s: String): Unit = out2.write(s.getBytes("US-ASCII"))
    w32of(out2, 16L); w2("ftyp"); w2("mp42"); w32of(out2, 0L)
    w32of(out2, 0L); w2("moov")
    w32of(out2, 8L); w2("mvhd")
    assert(timed(Mp4Header.parse(out2.toByteArray)).isEmpty)
    // (c) same, but the child is to-EOF (size 0) with only the 8-byte
    // header left — boxEnd == end == b.length, still no room for ver/flags
    val out3 = new java.io.ByteArrayOutputStream()
    def w3(s: String): Unit = out3.write(s.getBytes("US-ASCII"))
    w32of(out3, 16L); w3("ftyp"); w3("isom"); w32of(out3, 0L)
    w32of(out3, 0L); w3("moov")
    w32of(out3, 0L); w3("mvhd")
    assert(timed(Mp4Header.parse(out3.toByteArray)).isEmpty)
  }

  test("mvhd whose declared extent crosses the moov boundary is refused") {
    // moov declares room for the child header only; the mvhd box claims a
    // full v0 payload that would read past the moov extent into whatever
    // bytes follow — must be None, not a parse of a neighbor's bytes
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def w32(v: Long): Unit =
      (3 to 0 by -1).foreach(k => out.write(((v >> (8 * k)) & 0xff).toInt))
    w32(16L); w("ftyp"); w("isom"); w32(0L)
    w32(8L + 12L); w("moov") // moov extent ends 12 bytes in
    w32(108L); w("mvhd"); w32(0L) // claims the full v0 box
    out.write(new Array[Byte](108)) // plausible trailing bytes to mis-read
    assert(timed(Mp4Header.parse(out.toByteArray)).isEmpty)
  }
}
