package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

class CoreSpec extends AnyFunSuite {
  test("normalize produces unit vectors; zero vector unchanged") {
    val v = Array(3f, 4f)
    val n = VectorOps.normalize(v)
    assert(math.abs(VectorOps.norm(n) - 1.0) < 1e-6)
    assert(n sameElements Array(0.6f, 0.8f))
    assert(VectorOps.normalize(Array(0f, 0f)) sameElements Array(0f, 0f))
  }

  test("l2Sq and argmin match brute force") {
    assert(VectorOps.l2Sq(Array(1f, 2f), Array(4f, 6f)) === 25.0)
    val cents = Array(Array(0f, 0f), Array(1f, 1f), Array(5f, 5f))
    assert(VectorOps.argminL2(Array(1.2f, 0.9f), cents) === 1)
    // tie → lowest index, matching numpy argmin
    assert(VectorOps.argminL2(Array(0.5f, 0.5f), Array(Array(0f, 0f), Array(1f, 1f))) === 0)
  }

  test("splits partitions a vector contiguously") {
    val s = VectorOps.splits(Array(1f, 2f, 3f, 4f), 2)
    assert(s(0) sameElements Array(1f, 2f))
    assert(s(1) sameElements Array(3f, 4f))
  }

  test("float32 codec round-trips and normalizes first (featsio semantics)") {
    val v = Array(3f, 4f)
    val b64 = FeatCodec.encodeFloat32(v)
    val back = FeatCodec.decodeFloat32(b64)
    assert(back sameElements Array(0.6f, 0.8f))
    // no-normalize round trip is byte-exact
    val raw = FeatCodec.decodeFloat32(FeatCodec.encodeFloat32(v, normalizeFirst = false))
    assert(raw sameElements v)
  }

  test("float64 codec round-trips") {
    val v = Array(1.5, -2.25, 0.125)
    val back = FeatCodec.decodeFloat64(FeatCodec.encodeFloat64(v, normalizeFirst = false))
    assert(back sameElements v)
  }

  test("sha1 is 40-hex uppercase of the bytes") {
    assert(FeatCodec.sha1Hex("abc".getBytes) === "A9993E364706816ABA3E25717850C26C9CD0D89D")
  }

  test("cell id packs/unpacks (model.py:706-710)") {
    assert(CellMath.cellId(3, 2, 8) === 26)
    assert(CellMath.unpackCell(26, 8) === ((3, 2)))
  }

  test("multisequence yields cells in nondecreasing distance order, exhaustively") {
    val d0 = Array(0.5, 0.1, 0.9, 0.3)
    val d1 = Array(0.2, 0.7, 0.05)
    val out = CellMath.multisequence(d0, d1).toList
    assert(out.size === 12)
    assert(out.map(_._2) === out.map(_._2).sorted)
    assert(out.map(_._1).toSet === (for (i <- 0 until 4; j <- 0 until 3) yield (i, j)).toSet)
    // best cell first: argmin d0 = 1, argmin d1 = 2
    assert(out.head._1 === ((1, 2)))
    out.foreach { case ((i, j), dist) => assert(math.abs(dist - (d0(i) + d1(j))) < 1e-12) }
  }

  test("eigenvalue allocation: greedy descending with first-min ties (numpy argmin semantics)") {
    val eig = Array(16.0, 8.0, 4.0, 2.0, 1.0, 0.5, 0.25, 0.125)
    val perm = CellMath.eigenvalueAllocation(2, eig)
    assert(perm.sorted.toSeq === (0 until 8))
    // golden trace: dims 0,3 -> b0; 1,2 -> b1; tie at (5,5) twice -> b0; rest fill b1/b0
    assert(perm.toSeq === Seq(0, 3, 4, 5, 1, 2, 6, 7))
  }

  test("eigenvalue allocation balances log-mass on a tie-free spectrum") {
    val eig = Array(81.0, 25.0, 9.0, 7.0, 5.0, 3.0, 2.0, 1.3)
    val perm = CellMath.eigenvalueAllocation(2, eig)
    val (b0, b1) = perm.splitAt(4)
    def mass(b: Array[Int]) = b.map(i => math.log(eig(i)) / math.log(2)).sum
    assert(math.abs(mass(b0) - mass(b1)) <= 2.0)
  }
}
