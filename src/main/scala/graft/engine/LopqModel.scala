package graft.engine

import graft.core.{CellMath, VectorOps}

/** Locally-Optimized Product Quantization model — the complete parameter set
  * of the reference's ANN engine (`lopq/lopq/model.py:447-541`), as an
  * immutable, broadcast-friendly case class.
  *
  * Shapes (D = full dimension, V = coarse clusters per split, M = total
  * subquantizers, S = clusters per subquantizer):
  *   - `coarse`:  [2][V][D/2]        coarse centroids per split
  *   - `rotations`: [2][V][D/2][D/2] per-cluster local rotation (rows =
  *     permuted eigenvectors, ref `model.py:196-204`)
  *   - `mus`: [2][V][D/2]            per-cluster mean residual
  *   - `subquantizers`: [2][M/2][S][D/M] product-quantizer centroids
  *
  * All methods are pure JVM math (no Spark) so they run identically on the
  * driver (query path) and inside executors (encode path) via broadcast.
  */
case class LopqModel(
    coarse: Array[Array[Array[Float]]],
    rotations: Array[Array[Array[Array[Float]]]],
    mus: Array[Array[Array[Float]]],
    subquantizers: Array[Array[Array[Array[Float]]]]) extends Serializable {

  val numCoarseSplits: Int = coarse.length          // always 2
  val v: Int = coarse(0).length
  val halfDim: Int = coarse(0)(0).length
  val dim: Int = halfDim * numCoarseSplits
  val numFineSplits: Int = subquantizers(0).length  // M/2
  val m: Int = numFineSplits * numCoarseSplits
  val subquantizerClusters: Int = subquantizers(0)(0).length
  val subDim: Int = dim / m

  /** Nearest coarse centroid per split (ref `model.py:predict_coarse`). */
  def predictCoarse(x: Array[Float]): (Int, Int) = {
    val s = VectorOps.splits(x, numCoarseSplits)
    (VectorOps.argminL2(s(0), coarse(0)), VectorOps.argminL2(s(1), coarse(1)))
  }

  /** Project to the local rotated residual frame of the given coarse cell:
    * per split, `R[c] · (x_split − C[c] − mu[c])` (ref `model.py:project`). */
  def project(x: Array[Float], coarseCodes: (Int, Int)): Array[Array[Float]] = {
    val s = VectorOps.splits(x, numCoarseSplits)
    Array.tabulate(numCoarseSplits) { split =>
      val c = if (split == 0) coarseCodes._1 else coarseCodes._2
      val r = VectorOps.subtract(VectorOps.subtract(s(split), coarse(split)(c)), mus(split)(c))
      VectorOps.matVec(rotations(split)(c), r)
    }
  }

  /** Fine (product-quantizer) codes given coarse codes
    * (ref `model.py:predict_fine`). */
  def predictFine(x: Array[Float], coarseCodes: (Int, Int)): Array[Short] = {
    val px = project(x, coarseCodes)
    val out = new Array[Short](m)
    var split = 0
    while (split < numCoarseSplits) {
      val subs = VectorOps.splits(px(split), numFineSplits)
      var f = 0
      while (f < numFineSplits) {
        out(split * numFineSplits + f) =
          VectorOps.argminL2(subs(f), subquantizers(split)(f)).toShort
        f += 1
      }
      split += 1
    }
    out
  }

  /** Full code: ((coarse0, coarse1), fine) (ref `model.py:predict`). */
  def predict(x: Array[Float]): ((Int, Int), Array[Short]) = {
    val cc = predictCoarse(x)
    (cc, predictFine(x, cc))
  }

  def cellIdFor(coarseCodes: (Int, Int)): Int =
    CellMath.cellId(coarseCodes._1, coarseCodes._2, v)

  /** ADC subquantizer distance tables for a query in the local frame of
    * `coarseCodes`: tables(m)(s) = ‖px_sub(m) − subC(m)(s)‖² (ref
    * `model.py:get_subquantizer_distances`). The per-candidate distance is
    * then Σ_m tables(m)(fine(m)) — see
    * [[graft.functions.VectorFunctions.adcDistance]]. */
  def subquantizerDistances(x: Array[Float], coarseCodes: (Int, Int)): Array[Array[Double]] = {
    val px = project(x, coarseCodes)
    val out = new Array[Array[Double]](m)
    var split = 0
    while (split < numCoarseSplits) {
      val subs = VectorOps.splits(px(split), numFineSplits)
      var f = 0
      while (f < numFineSplits) {
        out(split * numFineSplits + f) =
          VectorOps.distancesSq(subs(f), subquantizers(split)(f))
        f += 1
      }
      split += 1
    }
    out
  }

  /** Squared distances of each half-query to every coarse centroid of each
    * split — the multisequence input (ref `lopq/lopq/search.py:34-43`). */
  def coarseDistances(x: Array[Float]): (Array[Double], Array[Double]) = {
    val s = VectorOps.splits(x, numCoarseSplits)
    (VectorOps.distancesSq(s(0), coarse(0)), VectorOps.distancesSq(s(1), coarse(1)))
  }

  /** Decode codes back to an approximate vector (ref `model.py:reconstruct`):
    * per split, `Rᵀ · sx + mu + C[c]` where sx concatenates the fine
    * centroids. Used by tests for code-stability properties. */
  def reconstruct(coarseCodes: (Int, Int), fine: Array[Short]): Array[Float] = {
    val out = new Array[Float](dim)
    var split = 0
    while (split < numCoarseSplits) {
      val c = if (split == 0) coarseCodes._1 else coarseCodes._2
      val sx = new Array[Float](halfDim)
      var f = 0
      while (f < numFineSplits) {
        val cent = subquantizers(split)(f)(fine(split * numFineSplits + f))
        System.arraycopy(cent, 0, sx, f * subDim, subDim)
        f += 1
      }
      // Rᵀ·sx: rows of R are eigenvectors, so Rᵀ·sx = Σ_k sx(k)·row_k
      val r = new Array[Float](halfDim)
      var k = 0
      while (k < halfDim) {
        val row = rotations(split)(c)(k); val w = sx(k).toDouble
        var i = 0
        while (i < halfDim) { r(i) = (r(i) + w * row(i)).toFloat; i += 1 }
        k += 1
      }
      var i = 0
      while (i < halfDim) {
        out(split * halfDim + i) = r(i) + mus(split)(c)(i) + coarse(split)(c)(i)
        i += 1
      }
      split += 1
    }
    out
  }
}
