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
    import breeze.linalg.{eigSym, DenseMatrix => BDM}
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    val dims = math.min(pcaDims, dim)
    require(dims % 2 == 0, s"pcaDims $dims must be even (split into 2 halves)")

    val covAgg = udaf(new CovarianceAgg(dim))
    val row = df
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .agg(covAgg(col("v")).as("s"))
      .select(col("s.count"), col("s.sum"), col("s.outer"))
      .head()
    val n = row.getLong(0).toDouble
    val sum = row.getSeq[Double](1).toArray
    val outer = row.getSeq[Double](2).toArray

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
