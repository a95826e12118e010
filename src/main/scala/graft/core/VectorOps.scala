package graft.core

/** Pure JVM float/double vector math used on the driver side of the LOPQ
  * pipeline (coarse-centroid distances, ADC table construction, local
  * projections). Cluster-side per-row math goes through Catalyst
  * expressions in [[graft.functions.VectorFunctions]] instead.
  *
  * Semantics mirror the reference's numpy ops:
  *   - L2 normalize: `cufacesearch/featurizer/featsio.py:13-22`
  *   - squared-L2 distance + argmin over a centroid matrix:
  *     `lopq/lopq/utils.py:33-53`
  */
object VectorOps {
  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def l2Sq(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    s
  }

  def l2(a: Array[Float], b: Array[Float]): Double = math.sqrt(l2Sq(a, b))

  def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  /** L2-normalize; zero vectors are returned unchanged (reference divides by
    * norm unconditionally producing NaN — we make the safer choice and cover
    * it in tests). */
  def normalize(a: Array[Float]): Array[Float] = {
    val n = norm(a)
    if (n == 0.0) a.clone()
    else {
      val out = new Array[Float](a.length)
      var i = 0
      while (i < a.length) { out(i) = (a(i) / n).toFloat; i += 1 }
      out
    }
  }

  /** Index of the nearest centroid by squared L2 (ties → lowest index,
    * matching numpy argmin). */
  def argminL2(v: Array[Float], centroids: Array[Array[Float]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < centroids.length) {
      val d = l2Sq(v, centroids(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Squared L2 distance to every centroid. */
  def distancesSq(v: Array[Float], centroids: Array[Array[Float]]): Array[Double] =
    centroids.map(c => l2Sq(v, c))

  def subtract(a: Array[Float], b: Array[Float]): Array[Float] = {
    val out = new Array[Float](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i) - b(i); i += 1 }
    out
  }

  /** Dense row-major matrix × vector: (rows x cols) * (cols) -> (rows). */
  def matVec(m: Array[Array[Float]], v: Array[Float]): Array[Float] = {
    val out = new Array[Float](m.length)
    var r = 0
    while (r < m.length) {
      val row = m(r)
      var s = 0.0; var i = 0
      while (i < v.length) { s += row(i).toDouble * v(i).toDouble; i += 1 }
      out(r) = s.toFloat
      r += 1
    }
    out
  }

  /** Split a vector into `nSplits` contiguous equal slices
    * (ref `lopq/lopq/utils.py:8-22`). */
  def splits(v: Array[Float], nSplits: Int): Array[Array[Float]] = {
    require(v.length % nSplits == 0, s"dim ${v.length} not divisible by $nSplits")
    val w = v.length / nSplits
    Array.tabulate(nSplits)(i => v.slice(i * w, (i + 1) * w))
  }
}
