package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.CellHistogram

/** [[CellHistogram.selectCells]] (quota-bounded heap selection, optionally
  * chunk-parallel) must be BIT-IDENTICAL to the full sort it replaced —
  * the visit order is consumed by every ANN oracle. The naive sort below is
  * the r6 implementation kept as the executable definition. */
class CellHistogramSpec extends AnyFunSuite {

  /** r6's selectCellsFrom, verbatim semantics: sort populated cells by
    * (dist, cell id), prefix until cumulative count ≥ quota. */
  private def naive(v: Int, d0: Array[Double], d1: Array[Double], quota: Int,
      counts: Map[Int, Long]): Seq[Int] = {
    val ordered = counts.iterator
      .collect { case (cell, cnt) if cnt > 0 => (d0(cell / v) + d1(cell % v), cell, cnt) }
      .toArray.sortBy(t => (t._1, t._2))
    val cells = Seq.newBuilder[Int]
    var retrieved = 0L
    var i = 0
    while (i < ordered.length && retrieved < quota) {
      cells += ordered(i)._2; retrieved += ordered(i)._3; i += 1
    }
    cells.result()
  }

  private def randomCase(v: Int, populated: Int, seed: Long):
      (Map[Int, Long], Array[Double], Array[Double]) = {
    val rnd = new scala.util.Random(seed)
    val counts = Iterator.continually(rnd.nextInt(v * v))
      .distinct.take(populated).map(c => c -> (1L + rnd.nextInt(40))).toMap
    // a coarse tie structure: distances drawn from a SMALL discrete set so
    // equal-sum cells are common and the (dist, cell) tie-break is exercised
    val d0 = Array.fill(v)(rnd.nextInt(8).toDouble)
    val d1 = Array.fill(v)(rnd.nextInt(8).toDouble)
    (counts, d0, d1)
  }

  test("bounded selection equals the full sort across shapes, quotas, ties") {
    for (seed <- 1L to 10L; v <- Seq(8, 64); quota <- Seq(1, 7, 50, 200, 100000)) {
      val (counts, d0, d1) = randomCase(v, math.min(v * v / 2 + 1, 500), seed)
      val hist = CellHistogram(counts)
      assert(hist.selectCells(v, d0, d1, quota) === naive(v, d0, d1, quota, counts),
        s"divergence at seed=$seed v=$v quota=$quota")
    }
  }

  test("zero quota, empty histogram, zero-count entries") {
    val hist = CellHistogram(Seq(3 -> 5L, 9 -> 0L, 12 -> 2L))
    val d = Array.fill(4)(1.0)
    assert(hist.selectCells(4, d, d, 0) === Seq.empty)
    assert(CellHistogram.empty.selectCells(4, d, d, 100) === Seq.empty)
    // a zero-count cell never enters the visit order (parity with the
    // naive collect-if-positive)
    assert(hist.selectCells(4, d, d, 100) === Seq(3, 12))
    assert(hist.total === 7L)
    assert(hist.countOf(9) === 0L && hist.countOf(3) === 5L && hist.countOf(99) === 0L)
  }

  test("the chunk-parallel path (P > threshold) matches the sort exactly") {
    // build past ParallelThreshold so selectCells takes the parallel branch
    val v = 1024 // 1M-cell grid
    val p = CellHistogram.ParallelThreshold + 1024
    val rnd = new scala.util.Random(7L)
    val ids = rnd.shuffle((0 until v * v).toList).take(p).toArray.sorted
    val cnts = Array.fill(p)(1L + rnd.nextInt(5))
    val hist = CellHistogram.fromSorted(ids, cnts)
    val d0 = Array.fill(v)(rnd.nextInt(64).toDouble)
    val d1 = Array.fill(v)(rnd.nextInt(64).toDouble)
    assert(hist.size > CellHistogram.ParallelThreshold)
    val counts = ids.zip(cnts).toMap
    for (quota <- Seq(100, 10000))
      assert(hist.selectCells(v, d0, d1, quota) === naive(v, d0, d1, quota, counts))
  }

  test("capacity escalation: a quota needing more than InitialCap cells stays exact") {
    // 5000 cells of count 1 → a quota of 3000 needs 3000 cells, past the
    // 1024-entry starting heap: the adaptive rescan must return the same
    // prefix the full sort does
    val v = 128
    val rnd = new scala.util.Random(11L)
    val counts = rnd.shuffle((0 until v * v).toList).take(5000).map(c => c -> 1L).toMap
    val d0 = Array.fill(v)(rnd.nextInt(4).toDouble)
    val d1 = Array.fill(v)(rnd.nextInt(4).toDouble)
    val hist = CellHistogram(counts)
    val got = hist.selectCells(v, d0, d1, 3000)
    assert(got.size === 3000)
    assert(got === naive(v, d0, d1, 3000, counts))
  }

  test("duplicate ids merge at construction; sorted invariant holds") {
    val hist = CellHistogram(Seq(5 -> 2L, 1 -> 1L, 5 -> 3L, 2 -> 4L))
    assert(hist.cellIds.toSeq === Seq(1, 2, 5))
    assert(hist.counts.toSeq === Seq(1L, 4L, 5L))
    assert(hist.toMap === Map(1 -> 1L, 2 -> 4L, 5 -> 5L))
  }
}
