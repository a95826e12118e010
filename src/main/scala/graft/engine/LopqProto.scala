package graft.engine

/** Model interchange in the REFERENCE'S protobuf schema
  * (`com.flickr.vision.lopq.LOPQModelParams` — field layout embedded in
  * `lopq/lopq/lopq_model_pb2.py:28-176`; exporter `lopq/lopq/model.py:
  * 748-787`, loader `:789-820`), so a non-Spark consumer — including the
  * reference implementation itself — can load a model trained here, and we
  * can import one trained there. The proto2 wire format is hand-encoded:
  * no protobuf dependency exists in the sandbox and none is needed — the
  * framing is varints plus length-delimited blocks.
  *
  * Schema (proto2):
  * {{{
  *   message Vector { repeated float values = 1 [packed=true]; }
  *   message Matrix { repeated float values = 1 [packed=true];
  *                    repeated uint32 shape = 2; }            // unpacked
  *   message LOPQModelParams {
  *     optional uint32 D = 1;  optional uint32 V = 2;
  *     optional uint32 M = 3;  optional uint32 num_subquantizers = 4;
  *     repeated Matrix Cs  = 5;   // 2 × [V][D/2]
  *     repeated Matrix Rs  = 6;   // 2V × [D/2][D/2], split-major cell order
  *     repeated Vector mus = 7;   // 2V × [D/2]
  *     repeated Matrix subs = 8;  // M × [S][D/M]
  *   }
  * }}}
  * Float payloads are row-major little-endian float32, exactly the
  * exporter's `np.nditer(a, order='C')`. The reference schema predates the
  * PCA variant, so the PCA front (when present) stays in the parquet store
  * only — same behavior as the reference's proto path.
  */
object LopqProto {

  // ------------------------------------------------------------- writing

  private final class Buf {
    val out = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7fL) | 0x80L).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def uint(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def bytes(field: Int, b: Array[Byte]): Unit = { tag(field, 2); varint(b.length.toLong); out.write(b) }
    def packedFloats(field: Int, xs: Array[Float]): Unit = {
      val bb = java.nio.ByteBuffer.allocate(4 * xs.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      xs.foreach(bb.putFloat)
      bytes(field, bb.array())
    }
    def result(): Array[Byte] = out.toByteArray
  }

  private def vectorMsg(values: Array[Float]): Array[Byte] = {
    val b = new Buf
    b.packedFloats(1, values)
    b.result()
  }

  private def matrixMsg(rows: Array[Array[Float]]): Array[Byte] = {
    val b = new Buf
    b.packedFloats(1, rows.flatten)
    b.uint(2, rows.length.toLong)
    b.uint(2, rows(0).length.toLong)
    b.result()
  }

  def toBytes(m: LopqModel): Array[Byte] = {
    val b = new Buf
    b.uint(1, m.dim.toLong)
    b.uint(2, m.v.toLong)
    b.uint(3, m.m.toLong)
    b.uint(4, m.subquantizerClusters.toLong)
    for (s <- 0 until m.numCoarseSplits) b.bytes(5, matrixMsg(m.coarse(s)))
    for (s <- 0 until m.numCoarseSplits; c <- 0 until m.v)
      b.bytes(6, matrixMsg(m.rotations(s)(c)))
    for (s <- 0 until m.numCoarseSplits; c <- 0 until m.v)
      b.bytes(7, vectorMsg(m.mus(s)(c)))
    for (s <- 0 until m.numCoarseSplits; f <- 0 until m.numFineSplits)
      b.bytes(8, matrixMsg(m.subquantizers(s)(f)))
    b.result()
  }

  def export(path: String, m: LopqModel): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path), toBytes(m))

  // ------------------------------------------------------------- reading

  private final class Reader(b: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < b.length
    def varint(): Long = {
      var shift = 0; var v = 0L
      while ({ val x = b(pos) & 0xff; pos += 1; v |= (x & 0x7fL) << shift; shift += 7; (x & 0x80) != 0 }) ()
      v
    }
    def lengthDelimited(): Array[Byte] = {
      val n = varint().toInt
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n)
      pos += n
      out
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => pos += 8
      case 2 => lengthDelimited(); ()
      case 5 => pos += 4
      case w => sys.error(s"unsupported wire type $w")
    }
  }

  private case class Mat(values: Array[Float], shape: Seq[Int]) {
    def rows: Array[Array[Float]] = shape match {
      case Seq(r, c) =>
        require(values.length == r * c, s"matrix ${values.length} != $r×$c")
        Array.tabulate(r)(i => java.util.Arrays.copyOfRange(values, i * c, (i + 1) * c))
      case Seq() => Array(values) // Vector (no shape field)
      case other => sys.error(s"unexpected shape $other")
    }
  }

  private def parseMat(bytes: Array[Byte]): Mat = {
    val r = new Reader(bytes)
    var values = Array.empty[Float]
    val shape = Seq.newBuilder[Int]
    while (r.hasMore) {
      val key = r.varint()
      ((key >> 3).toInt, (key & 7).toInt) match {
        case (1, 2) => // packed floats
          val payload = r.lengthDelimited()
          val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          values = Array.fill(payload.length / 4)(bb.getFloat())
        case (1, 5) => // tolerated: an unpacked float element
          values = values :+ java.nio.ByteBuffer.wrap(bytes, r.pos, 4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getFloat()
          r.pos += 4
        case (2, 0) => shape += r.varint().toInt
        case (_, w) => r.skip(w)
      }
    }
    Mat(values, shape.result())
  }

  def fromBytes(bytes: Array[Byte]): LopqModel = {
    val r = new Reader(bytes)
    var (d, v, m, s) = (0, 0, 0, 0)
    val cs, rs, subs = Seq.newBuilder[Array[Array[Float]]]
    val mus = Seq.newBuilder[Array[Float]]
    while (r.hasMore) {
      val key = r.varint()
      ((key >> 3).toInt, (key & 7).toInt) match {
        case (1, 0) => d = r.varint().toInt
        case (2, 0) => v = r.varint().toInt
        case (3, 0) => m = r.varint().toInt
        case (4, 0) => s = r.varint().toInt
        case (5, 2) => cs += parseMat(r.lengthDelimited()).rows
        case (6, 2) => rs += parseMat(r.lengthDelimited()).rows
        case (7, 2) => mus += parseMat(r.lengthDelimited()).values
        case (8, 2) => subs += parseMat(r.lengthDelimited()).rows
        case (_, w) => r.skip(w)
      }
    }
    val csA = cs.result(); val rsA = rs.result(); val musA = mus.result(); val subsA = subs.result()
    require(csA.length == 2 && csA(0).length == v, s"Cs ${csA.length}×${csA.headOption.map(_.length)}")
    require(rsA.length == 2 * v && musA.length == 2 * v, s"Rs ${rsA.length} mus ${musA.length}")
    require(subsA.length == m && subsA.forall(_.length == s), s"subs ${subsA.length}")
    val fine = m / 2
    LopqModel(
      coarse = Array.tabulate(2, v)((sp, c) => csA(sp)(c)),
      rotations = Array.tabulate(2, v)((sp, c) => rsA(sp * v + c)),
      mus = Array.tabulate(2, v)((sp, c) => musA(sp * v + c)),
      subquantizers = Array.tabulate(2, fine)((sp, f) => subsA(sp * fine + f)))
  }

  def load(path: String): LopqModel =
    fromBytes(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
}
