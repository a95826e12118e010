package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.AudioHeader

/** Byte-level WAV sniffing edge cases the oracle's arithmetic twin cannot
  * see: rejection of foreign/truncated/compressed payloads, odd-size chunk
  * padding, and header-prefix (dataless) parsing. */
class AudioHeaderSpec extends AnyFunSuite {

  test("synthesized PCM WAV round-trips every field") {
    val b = AudioHeader.synthesize(channels = 2, sampleRate = 44100,
      bits = 16, dataBytes = 44100 * 4) // exactly one second
    val w = AudioHeader.parse(b).get
    assert(w.channels == 2 && w.sampleRate == 44100 && w.bits == 16)
    assert(w.dataBytes == 44100L * 4)
    assert(w.durationMicros == 1000000L)
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
    assert(w.durationMicros == 4096L * 1000000 / (16000L * 4))
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
    import graft.core.Mp4Header
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

  test("compressed (non-PCM) fmt is refused — metadata needs a codec there") {
    val b = AudioHeader.synthesize(1, 8000, 16, 32)
    // fmt audioFormat field sits right after "fmt " + size: flip PCM(1) → 2
    val i = (0 until b.length - 4).find(k =>
      b(k) == 'f' && b(k + 1) == 'm' && b(k + 2) == 't' && b(k + 3) == ' ').get
    b(i + 8) = 2
    assert(AudioHeader.parse(b).isEmpty)
  }
}
