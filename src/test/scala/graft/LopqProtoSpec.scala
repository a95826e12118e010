package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{LopqModel, LopqProto}

/** Wire-format tests for the reference-schema protobuf interchange
  * (`lopq_model_pb2.py` layout): a byte-level golden pin of a minimal
  * model, and a full round-trip. Writer and reader implement the documented
  * framing independently of each other's internals, and the golden bytes
  * are hand-assembled from the proto2 wire rules, so all three cannot agree
  * by sharing a bug. */
class LopqProtoSpec extends AnyFunSuite {

  /** Deterministic synthetic model: v cells, dim 2·halfDim, m subquantizers
    * with s clusters — values are index-derived so mismatches localize. */
  private def model(v: Int, halfDim: Int, m: Int, s: Int): LopqModel = {
    val fine = m / 2
    val subDim = (2 * halfDim) / m
    LopqModel(
      coarse = Array.tabulate(2, v, halfDim)((sp, c, i) => (sp * 100 + c * 10 + i).toFloat),
      rotations = Array.tabulate(2, v, halfDim, halfDim)(
        (sp, c, i, j) => (sp + 1) * 0.5f + c + i * 0.25f - j * 0.125f),
      mus = Array.tabulate(2, v, halfDim)((sp, c, i) => sp - c * 0.5f + i),
      subquantizers = Array.tabulate(2, fine, s, subDim)(
        (sp, f, sc, i) => sp * 2f + f * 0.5f - sc + i * 0.75f))
  }

  test("golden wire bytes of a minimal model match hand-assembled proto2") {
    // v=1, halfDim=1 (D=2), m=2 (1 fine split per half), s=1, subDim=1
    val tiny = LopqModel(
      coarse = Array(Array(Array(1.0f)), Array(Array(2.0f))),
      rotations = Array(Array(Array(Array(3.0f))), Array(Array(Array(4.0f)))),
      mus = Array(Array(Array(5.0f)), Array(Array(6.0f))),
      subquantizers = Array(Array(Array(Array(7.0f))), Array(Array(Array(8.0f)))))
    def f32(x: Float): Seq[Int] = {
      val bb = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putFloat(x)
      bb.array().map(_ & 0xff).toSeq
    }
    // Matrix [1][1] msg: 0x0a (values, packed) len 4 <f32>, 0x10 (shape) 1, 0x10 1
    def mat(x: Float): Seq[Int] = Seq(0x0a, 4) ++ f32(x) ++ Seq(0x10, 1, 0x10, 1)
    // Vector [1] msg: 0x0a len 4 <f32>
    def vec(x: Float): Seq[Int] = Seq(0x0a, 4) ++ f32(x)
    val expected: Seq[Int] =
      Seq(0x08, 2,  // D = 2
          0x10, 1,  // V = 1
          0x18, 2,  // M = 2
          0x20, 1)  // num_subquantizers = 1
        .++(Seq(0x2a, 10) ++ mat(1.0f)).++(Seq(0x2a, 10) ++ mat(2.0f))   // Cs
        .++(Seq(0x32, 10) ++ mat(3.0f)).++(Seq(0x32, 10) ++ mat(4.0f))   // Rs
        .++(Seq(0x3a, 6) ++ vec(5.0f)).++(Seq(0x3a, 6) ++ vec(6.0f))     // mus
        .++(Seq(0x42, 10) ++ mat(7.0f)).++(Seq(0x42, 10) ++ mat(8.0f))   // subs
    val got = LopqProto.toBytes(tiny).map(_ & 0xff).toSeq
    assert(got === expected)
  }

  test("model round-trips bit-exactly through the wire format") {
    val m0 = model(v = 3, halfDim = 4, m = 4, s = 5)
    val m1 = LopqProto.fromBytes(LopqProto.toBytes(m0))
    assert(m1.v === m0.v && m1.m === m0.m && m1.dim === m0.dim &&
      m1.subquantizerClusters === m0.subquantizerClusters)
    for (sp <- 0 until 2; c <- 0 until m0.v) {
      assert(m1.coarse(sp)(c).sameElements(m0.coarse(sp)(c)))
      assert(m1.mus(sp)(c).sameElements(m0.mus(sp)(c)))
      for (k <- 0 until m0.halfDim)
        assert(m1.rotations(sp)(c)(k).sameElements(m0.rotations(sp)(c)(k)))
    }
    for (sp <- 0 until 2; f <- 0 until m0.numFineSplits; sc <- 0 until m0.subquantizerClusters)
      assert(m1.subquantizers(sp)(f)(sc).sameElements(m0.subquantizers(sp)(f)(sc)))
  }

  test("export/load file path round-trips and the store writes the sidecar") {
    val m0 = model(v = 2, halfDim = 2, m = 2, s = 3)
    val p = "/root/repo/target/graft-index-test/model_roundtrip.pb"
    new java.io.File(p).getParentFile.mkdirs()
    LopqProto.export(p, m0)
    val m1 = LopqProto.load(p)
    assert(m1.coarse(1)(1).sameElements(m0.coarse(1)(1)))
    // the persisted-index sidecar exists wherever a model was saved (the
    // main LopqIndexSpec dir is built earlier in the suite run if present)
    val sidecar = new java.io.File("/root/repo/target/graft-index-test/main/model.pb")
    if (sidecar.exists()) {
      val fromStore = LopqProto.load(sidecar.getPath)
      assert(fromStore.v > 0 && fromStore.dim > 0)
    }
  }
}
