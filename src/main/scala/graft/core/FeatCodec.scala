package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import java.util.Base64

/** Feature-at-rest codec with the reference's semantics
  * (`cufacesearch/featurizer/featsio.py:4-54`):
  * features are L2-normalized, then the raw little-endian IEEE-754 buffer is
  * base64-encoded. Full-image features are float32, face features float64
  * (`featurizer/generic_featurizer.py:51-56`).
  */
object FeatCodec {
  /** normalize → float32 LE bytes → base64 (ref featsio.py:4-22). */
  def encodeFloat32(v: Array[Float], normalizeFirst: Boolean = true): String = {
    val x = if (normalizeFirst) VectorOps.normalize(v) else v
    val bb = ByteBuffer.allocate(x.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    x.foreach(bb.putFloat)
    Base64.getEncoder.encodeToString(bb.array())
  }

  def decodeFloat32(b64: String): Array[Float] = {
    val bb = ByteBuffer.wrap(Base64.getDecoder.decode(b64)).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Float](bb.remaining() / 4)
    var i = 0
    while (bb.remaining() >= 4) { out(i) = bb.getFloat; i += 1 }
    out
  }

  def encodeFloat64(v: Array[Double], normalizeFirst: Boolean = true): String = {
    val n = math.sqrt(v.map(x => x * x).sum)
    val x = if (normalizeFirst && n != 0.0) v.map(_ / n) else v
    val bb = ByteBuffer.allocate(x.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    x.foreach(bb.putDouble)
    Base64.getEncoder.encodeToString(bb.array())
  }

  def decodeFloat64(b64: String): Array[Double] = {
    val bb = ByteBuffer.wrap(Base64.getDecoder.decode(b64)).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Double](bb.remaining() / 8)
    var i = 0
    while (bb.remaining() >= 8) { out(i) = bb.getDouble; i += 1 }
    out
  }

  /** 40-hex uppercase SHA1 of raw bytes (ref `imgio/imgio.py:23-39`,
    * upper-cased at `updater/extraction_checker.py:157`). */
  def sha1Hex(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.digest(bytes).map("%02X".format(_)).mkString
  }
}
