package graft.core

/** Real WAV (RIFF) container header parsing — format code, channels, sample
  * rate, bit depth, and payload size read straight from the leading bytes,
  * no codec library; duration derives from the fmt chunk's byte rate for
  * PCM (where it is exact). The audio twin of [[ImageHeader]]: the
  * reference sniffs image containers at the byte level before any decode
  * (`imgio/imgio.py:42-111`); a multimodal corpus treats audio the same
  * way — an opaque binary column whose TYPED METADATA is recoverable from
  * the header alone, so routing/filtering never touches a decoder.
  * Returns None when the payload is not a well-formed WAV, so callers can
  * fall back for foreign payloads. Non-PCM (compressed) WAVs still parse:
  * the format code and channel/rate metadata are in the header and a
  * corpus routes on them; only the duration is withheld (it needs a
  * codec's frame table, not arithmetic on the byte rate).
  *
  * SECURITY/ROBUSTNESS: these sniffers run over UNTRUSTED corpus bytes
  * inside executor tasks. Chunk sizes are attacker-controlled unsigned
  * 32-bit values; all cursor arithmetic is done in Long so a crafted size
  * near 2^32 can never truncate into a non-advancing or negative Int step
  * (which would hang the task — and its speculative retry — forever).
  * Every walk either advances by >= 8 bytes per iteration or returns.
  */
object AudioHeader {

  /** WAVE_FORMAT_PCM — the only format whose duration is header-derivable. */
  val PcmFormat = 1

  /** Parsed header: fmt format code, channels, sample rate (Hz),
    * bits/sample, data payload bytes, and integer-µs duration
    * (dataBytes · 1e6 / byteRate) — Some only for PCM, where the byte
    * rate is exact; compressed formats route on the other fields. */
  final case class Wav(format: Int, channels: Int, sampleRate: Int,
      bits: Int, dataBytes: Long, durationMicros: Option[Long])

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
    var i: Long = 12L
    // format, channels, rate, bits, byteRate
    var fmt: Option[(Int, Int, Int, Int, Long)] = None
    while (i + 8 <= b.length) {
      val at = i.toInt // safe: i + 8 <= b.length <= Int.MaxValue
      val size = le32(b, at + 4) // unsigned 32-bit, UNTRUSTED
      if (tag(b, at, "fmt ")) {
        if (i + 8 + 16 > b.length || size < 16) return None
        var format = le16(b, at + 8)
        // WAVE_FORMAT_EXTENSIBLE (0xFFFE — the modern container for >2ch /
        // >16-bit PCM) carries the REAL format code in the first two bytes
        // of the SubFormat GUID at fmt-payload offset 24; resolving it
        // here means extensible PCM keeps its header-exact duration
        if (format == 0xFFFE && size >= 40 && i + 8 + 26 <= b.length)
          format = le16(b, at + 32)
        fmt = Some((format, le16(b, at + 10),
          le32(b, at + 12).toInt, le16(b, at + 22), le32(b, at + 16)))
      } else if (tag(b, at, "data")) {
        return fmt.map { case (format, ch, rate, bits, byteRate) =>
          Wav(format, ch, rate, bits, size,
            if (format == PcmFormat && byteRate != 0)
              Some(size * 1000000L / byteRate)
            else None)
        }
      }
      // Long arithmetic: size 0xFFFFFFF8 must NOT become toInt = -8 and
      // freeze the cursor — the advance is always >= 8, so the loop
      // terminates on any byte string (crafted sizes just overrun the
      // buffer and fall out of the loop to None).
      i += 8L + size + (size & 1L) // chunks pad to even offsets
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
