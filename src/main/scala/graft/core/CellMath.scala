package graft.core

import scala.collection.mutable

/** Multi-index cell arithmetic and traversal for the LOPQ index.
  *
  * - cell id packing: `lopq/lopq/model.py:706-710` (`cell = coarse0*V + coarse1`)
  * - multisequence traversal: `lopq/lopq/search.py:13-82` — lazily yields
  *   cells in nondecreasing (d0[i] + d1[j]) order via a min-heap
  *   (Babenko & Lempitsky, "The Inverted Multi-Index", CVPR'12).
  * - eigenvalue-balanced permutation: `lopq/lopq/model.py:19-71`.
  *
  * All driver-side: V ≤ 4096, so these are tiny in-memory ops; the cluster
  * only ever sees the resulting cell-id list as a partition-pruning predicate.
  */
object CellMath {
  def cellId(coarse0: Int, coarse1: Int, v: Int): Int = coarse0 * v + coarse1
  def unpackCell(cell: Int, v: Int): (Int, Int) = (cell / v, cell % v)

  /** Lazily yield ((i, j), dist) cell coordinates in nondecreasing
    * d0(i)+d1(j) order. `d0`/`d1` are the query's squared distances to each
    * coarse centroid of split 0 / split 1 (NOT pre-sorted — we sort here,
    * like `multisequence` does via argsort at search.py:34-43). */
  def multisequence(d0: Array[Double], d1: Array[Double]): Iterator[((Int, Int), Double)] = {
    val o0 = d0.indices.sortBy(d0)(Ordering.Double.TotalOrdering).toArray
    val o1 = d1.indices.sortBy(d1)(Ordering.Double.TotalOrdering).toArray
    new Iterator[((Int, Int), Double)] {
      // heap over *rank* space; emit maps ranks back through o0/o1
      private val heap = mutable.PriorityQueue.empty[(Double, Int, Int)](
        Ordering.by[(Double, Int, Int), (Double, Int, Int)](identity).reverse)
      private val seen = mutable.HashSet.empty[(Int, Int)]
      private def push(i: Int, j: Int): Unit =
        if (i < o0.length && j < o1.length && seen.add((i, j)))
          heap.enqueue((d0(o0(i)) + d1(o1(j)), i, j))
      push(0, 0)
      def hasNext: Boolean = heap.nonEmpty
      def next(): ((Int, Int), Double) = {
        val (d, i, j) = heap.dequeue()
        // traversal rule from search.py:58-76: advance j if i==0 or (i-1,j+1)
        // already emitted; advance i if j==0 or (i+1,j-1) already emitted.
        // The simpler push-both-neighbors + dedup visits the same frontier.
        push(i + 1, j)
        push(i, j + 1)
        ((o0(i), o1(j)), d)
      }
    }
  }

  /** Balanced eigenvalue allocation (ref `model.py:19-71`): permute
    * eigen-dimensions into `numBuckets` buckets so the log-eigenvalue mass is
    * balanced; greedy assignment of descending eigenvalues into the bucket
    * with the smallest current sum that still has capacity.
    * Returns the permutation (bucket-major concatenation of dims). */
  def eigenvalueAllocation(numBuckets: Int, eigenvalues: Array[Double]): Array[Int] = {
    val d = eigenvalues.length
    val cap = d / numBuckets
    require(d % numBuckets == 0, s"dim $d not divisible by $numBuckets")
    // descending eigenvalue order (numpy argsort of -eigenvalues)
    val order = eigenvalues.indices.sortBy(i => (-eigenvalues(i), i)).toArray
    val bucketSums = Array.fill(numBuckets)(0.0)
    val buckets = Array.fill(numBuckets)(mutable.ArrayBuffer.empty[Int])
    for (dim <- order) {
      // smallest current sum among non-full buckets; ties → lowest index
      var best = -1; var bestSum = Double.MaxValue
      var b = 0
      while (b < numBuckets) {
        if (buckets(b).length < cap && bucketSums(b) < bestSum) {
          bestSum = bucketSums(b); best = b
        }
        b += 1
      }
      buckets(best) += dim
      // ref uses log2 of eigenvalue (model.py:46); clamp tiny values
      bucketSums(best) += math.log(math.max(eigenvalues(dim), 1e-10)) / math.log(2.0)
    }
    buckets.flatMap(_.toArray)
  }
}
