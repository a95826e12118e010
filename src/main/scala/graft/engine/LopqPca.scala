package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.CellMath

/** Global PCA front-end of the release LOPQ model (`lopq_pca`): project
  * D-dim features to `pcaDims` before coarse/fine quantization.
  *
  * Reference: `lopq/lopq/model.py:242-287` (train_pca — raw second-moment
  * accumulation, `A = Σ d·dᵀ/(n−1) − mu·muᵀ`, `eigh`, top eigenvalues,
  * eigenvalue-balanced column permutation across the two coarse halves) and
  * `model.py:961-978` (apply_PCA — `(x − mu)·P`, optional L2 renorm, the
  * query-path entry of `lopq/lopq/search.py:198-200`).
  *
  * `p(j)` is COLUMN j of the reference's P (length D): component j of the
  * projection is `dot(x − mu, p(j))`. Kept in double precision so the
  * projection is bit-reproducible against a SQL oracle; `apply` truncates
  * to float32 exactly like the reference.
  */
case class LopqPca(mu: Array[Double], p: Array[Array[Double]], renorm: Boolean)
    extends Serializable {
  val dim: Int = mu.length
  val pcaDims: Int = p.length

  /** Project one vector: `(x − mu)·P` (+ optional renorm), float32 out. */
  def apply(x: Array[Float]): Array[Float] = {
    val diff = new Array[Double](dim)
    var i = 0
    while (i < dim) { diff(i) = x(i).toDouble - mu(i); i += 1 }
    val out = new Array[Double](pcaDims)
    var j = 0
    while (j < pcaDims) {
      val col = p(j)
      var s = 0.0
      var k = 0
      while (k < dim) { s += diff(k) * col(k); k += 1 }
      out(j) = s
      j += 1
    }
    if (renorm) {
      var n = 0.0
      j = 0
      while (j < pcaDims) { n += out(j) * out(j); j += 1 }
      val inv = 1.0 / math.sqrt(n)
      j = 0
      while (j < pcaDims) { out(j) *= inv; j += 1 }
    }
    out.map(_.toFloat)
  }
}

object LopqPca {

  /** Distributed PCA training (ref `train_pca`, `model.py:242-287`):
    * one [[CovarianceAgg]] pass (map-side partials — the Σ d·dᵀ loop that
    * is single-node O(N·D²) in the reference becomes a treeish aggregate),
    * then driver-side eigSym on the D×D estimator, top-`pcaDims`
    * eigenvalues, and the eigenvalue-balanced permutation into 2 buckets so
    * variance splits evenly across the coarse halves. */
  def train(df: DataFrame, vecCol: String, pcaDims: Int, renorm: Boolean = false): LopqPca = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)

    val covAgg = udaf(new CovarianceAgg(dim))
    val row = df
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .agg(covAgg(col("v")).as("s"))
      .select(col("s.count"), col("s.sum"), col("s.outer"))
      .head()
    fromMoments(dim, pcaDims, row.getLong(0), row.getSeq[Double](1).toArray,
      row.getSeq[Double](2).toArray, renorm)
  }

  /** [[train]] twin for release-width D (4096, `featurizer/generic_
    * featurizer.py:51-56`): the D² moment buffer is ~134 MB of doubles —
    * through the udaf row encoder that boxes and re-serializes at every
    * partial merge, so here each partition accumulates into primitive
    * arrays (`mapPartitions`). The partials then merge BLOCK-DISTRIBUTED:
    * each partition emits its outer-product matrix as keyed row-block
    * slices (~4 MB each) that meet in a `reduceByKey`, so no single task
    * result approaches `spark.driver.maxResultSize` (a whole-matrix
    * treeReduce shipped 134 MB per partial and died at 8 partials ×
    * 134 MB > 1 GB) and the merge itself parallelizes across reducers —
    * the same shape that survives 1000 executors. Identical math to
    * [[train]] (same `fromMoments` tail). */
  def trainWide(df: DataFrame, vecCol: String, pcaDims: Int, renorm: Boolean = false): LopqPca = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    // row-block slicing of the D×D moment matrix: ~4 MB per block
    val rowsPerBlock = math.max(1, (4 << 20) / (dim * 8))
    val nBlocks = (dim + rowsPerBlock - 1) / rowsPerBlock
    val parts = math.min(df.rdd.getNumPartitions,
      df.sparkSession.sparkContext.defaultParallelism)
    // cast like [[train]] does, so the twin accepts array<float> AND
    // array<double> with identical math (ADVICE r7: the raw getSeq[Float]
    // read threw ClassCastException on a double column; float→double cast
    // is exact, so float-column results are unchanged)
    val slices = df.select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .coalesce(parts).rdd.mapPartitions { it =>
      var count = 0L
      val sum = new Array[Double](dim)
      val outer = new Array[Double](dim * dim)
      val x = new Array[Double](dim)
      it.foreach { row =>
        val v = row.getSeq[Double](0)
        var i = 0
        while (i < dim) { x(i) = v(i); i += 1 }
        count += 1L
        i = 0
        while (i < dim) {
          val xi = x(i)
          sum(i) += xi
          val base = i * dim
          var j = 0
          while (j < dim) { outer(base + j) += xi * x(j); j += 1 }
          i += 1
        }
      }
      // key -1: [count, sum…]; key b: outer rows [b·rpb, (b+1)·rpb)
      val header = (-1, count.toDouble +: sum)
      val blocks = Iterator.range(0, nBlocks).map { b =>
        val lo = b * rowsPerBlock * dim
        val hi = math.min((b + 1) * rowsPerBlock, dim) * dim
        (b, java.util.Arrays.copyOfRange(outer, lo, hi))
      }
      Iterator.single(header) ++ blocks
    }
    val merged = slices
      .reduceByKey({ (a, b) =>
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }, nBlocks + 1)
      .collect()
      .toMap
    val header = merged(-1)
    val outer = new Array[Double](dim * dim)
    for (b <- 0 until nBlocks) {
      val lo = b * rowsPerBlock * dim
      System.arraycopy(merged(b), 0, outer, lo, merged(b).length)
    }
    fromMoments(dim, pcaDims, header(0).toLong,
      java.util.Arrays.copyOfRange(header, 1, dim + 1), outer, renorm)
  }

  /** Shared tail of both training paths: covariance estimator from the raw
    * moments, `eigSym`, top-`dims` eigenvectors, eigenvalue-balanced
    * permutation across the two coarse halves (ref `model.py:271-287`). */
  private def fromMoments(dim: Int, pcaDims: Int, count: Long,
      sum: Array[Double], outer: Array[Double], renorm: Boolean): LopqPca = {
    import breeze.linalg.{eigSym, DenseMatrix => BDM}
    val dims = math.min(pcaDims, dim)
    require(dims % 2 == 0, s"pcaDims $dims must be even (split into 2 halves)")
    val n = count.toDouble
    val mu = sum.map(_ / n)
    val a = BDM.tabulate(dim, dim) { (i, j) =>
      outer(i * dim + j) / (n - 1.0) - mu(i) * mu(j)
    }
    val es = eigSym(a) // ascending eigenvalues, eigenvectors in columns
    val topStart = dim - dims
    val topEig = Array.tabulate(dims)(k => es.eigenvalues(topStart + k))
    val perm = CellMath.eigenvalueAllocation(2, topEig)
    val p = Array.tabulate(dims) { j =>
      val srcCol = topStart + perm(j)
      Array.tabulate(dim)(i => es.eigenvectors(i, srcCol))
    }
    LopqPca(mu, p, renorm)
  }
}
