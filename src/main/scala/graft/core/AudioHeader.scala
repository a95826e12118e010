package graft.core

/** Real WAV (RIFF) container header parsing — channels, sample rate, bit
  * depth, and payload size read straight from the leading bytes, no codec
  * library; duration derives from the fmt chunk's byte rate. The audio
  * twin of [[ImageHeader]]: the reference sniffs image containers at the
  * byte level before any decode (`imgio/imgio.py:42-111`); a multimodal
  * corpus treats audio the same way — an opaque binary column whose TYPED
  * METADATA is recoverable from the header alone, so routing/filtering
  * never touches a decoder. Returns None when the payload is not a
  * well-formed PCM WAV, so callers can fall back for foreign payloads.
  */
object AudioHeader {

  /** Parsed header: channels, sample rate (Hz), bits/sample, data payload
    * bytes, and integer-µs duration (dataBytes · 1e6 / byteRate). */
  final case class Wav(channels: Int, sampleRate: Int, bits: Int,
      dataBytes: Long, durationMicros: Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
      (u8(b, i + 3).toLong << 24)) & 0xffffffffL
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    (0 until 4).forall(k => b(i + k) == s.charAt(k).toByte)

  /** Walk the RIFF chunk list to `fmt ` and `data`. Chunks are
    * `(id 4B, size LE32, payload, odd-size pad byte)`; unknown chunks
    * (LIST, fact, …) are legal and skipped — exactly the walk a header
    * sniffer needs, a fixed-offset read is wrong the moment a LIST chunk
    * precedes fmt. The data chunk's size is read from its header; the
    * payload itself need not be present (streaming sniff of a prefix). */
  def parse(b: Array[Byte]): Option[Wav] = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Long)] = None // channels, rate, bits, byteRate
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (tag(b, i, "fmt ")) {
        if (i + 8 + 16 > b.length || size < 16) return None
        val audioFormat = le16(b, i + 8)
        if (audioFormat != 1) return None // PCM only — compressed needs a codec
        fmt = Some((le16(b, i + 10), le32(b, i + 12).toInt,
          le16(b, i + 22), le32(b, i + 16)))
      } else if (tag(b, i, "data")) {
        return fmt.map { case (ch, rate, bits, byteRate) =>
          Wav(ch, rate, bits, size,
            if (byteRate == 0) 0L else size * 1000000L / byteRate)
        }
      }
      i += 8 + size.toInt + (size.toInt & 1) // chunks pad to even offsets
    }
    None
  }

  /** Minimal WELL-FORMED PCM WAV for fixtures: RIFF/WAVE, a LIST chunk
    * BEFORE fmt (so the chunk walk is exercised, not a fixed offset),
    * the 16-byte PCM fmt chunk, and a zero-filled data payload. */
  def synthesize(channels: Int, sampleRate: Int, bits: Int,
      dataBytes: Int): Array[Byte] = {
    val listPayload = 12 // "INFO" + one 4-byte-payload sub-chunk header
    val riffSize = 4 + (8 + listPayload) + (8 + 16) + (8 + dataBytes)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = (0 until 4).foreach(k => out.write(((v >> (8 * k)) & 0xff).toInt))
    w("RIFF"); w32(riffSize); w("WAVE")
    w("LIST"); w32(listPayload); w("INFO"); w("ICMT"); w32(0L)
    val blockAlign = channels * bits / 8
    w("fmt "); w32(16L); w16(1); w16(channels); w32(sampleRate)
    w32(sampleRate.toLong * blockAlign); w16(blockAlign); w16(bits)
    w("data"); w32(dataBytes.toLong); out.write(new Array[Byte](dataBytes))
    out.toByteArray
  }
}
