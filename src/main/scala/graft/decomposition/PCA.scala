package graft.decomposition

import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.core.{Estimator, Model, util}

/** Ref: dask_ml.decomposition.PCA (decomposition/pca.py:198-354) and
  * TruncatedSVD (truncated_svd.py:157-208).
  *
  * Design: center via one aggregate pass (means), then SVD of the
  * centered RowMatrix. RowMatrix.computeSVD computes the Gram matrix via
  * treeAggregate (p×p on the driver; fine for p up to ~10⁴) and
  * eigendecomposes locally — the Spark-native equivalent of the
  * reference's tall-skinny QR path (pca.py:272-281, Benson 2013): one
  * distributed pass, driver-side small linalg. Components are
  * sign-stabilized like `svd_flip` (utils.py:41-48).
  */
class PCA(
    val featureCols: Seq[String],
    val nComponents: Int,
    val center: Boolean = true,
    val solver: String = "full", // pca.py:272-281: "full" | "randomized"
    val whiten: Boolean = false, // pca.py:53,379-381: scale pcs to unit variance
    val powerIter: Int = 1,
    val oversample: Int = 10,
    val seed: Long = 42
) extends Estimator[PCAModel] {
  require(nComponents >= 1 && nComponents <= featureCols.size)
  require(Seq("full", "auto", "randomized").contains(solver))

  def fit(df: DataFrame): PCAModel = {
    val p = featureCols.size
    val means =
      if (center) util.aggRow(df, featureCols.map(c => avg(col(c))))
      else Array.fill(p)(0.0)
    val (sv, v, n) =
      if (solver == "randomized") fitRandomized(df, means)
      else fitFull(df, means)
    // singular values → explained variance: s²/n (ddof=0 population, like
    // the reference's da.var over centered data)
    val ev = sv.map(s => s * s / n)
    // total variance from a second tiny agg (sum of per-column var)
    val totalVar =
      if (center) util.aggRow(df, featureCols.map(c => var_pop(col(c)))).sum
      else util.aggRow(df, featureCols.map(c => avg(col(c) * col(c)))).sum
    // sign-stabilize: largest-|loading| coordinate made positive
    // (svd_flip analog)
    val components = v.map { comp =>
      val mx = comp.indices.maxBy(i => math.abs(comp(i)))
      if (comp(mx) < 0) comp.map(-_) else comp
    }
    new PCAModel(featureCols, means, components, ev, ev.map(_ / totalVar),
      totalVar, whiten)
  }

  private def centeredRows(df: DataFrame, means: Array[Double]) = {
    val p = featureCols.size
    df.select(featureCols.map(col): _*).rdd.map { r =>
      Array.tabulate(p)(i =>
        (r.get(i) match {
          case d: Double => d
          case f: Float => f.toDouble
          case i2: Int => i2.toDouble
          case l: Long => l.toDouble
          case nn: Number => nn.doubleValue()
        }) - means(i))
    }
  }

  /** Exact path: MLlib RowMatrix SVD (Gram treeAggregate + driver
    * eigen — the tall-skinny analog of the reference's TSQR).
    */
  private def fitFull(df: DataFrame, means: Array[Double]):
      (Array[Double], Array[Array[Double]], Long) = {
    val p = featureCols.size
    val mat = new RowMatrix(centeredRows(df, means).map(OldVectors.dense))
    val n = mat.numRows()
    val svd = mat.computeSVD(nComponents, computeU = false)
    val v = Array.tabulate(nComponents)(j =>
      Array.tabulate(p)(i => svd.V(i, j)))
    (svd.s.toArray, v, n)
  }

  /** Randomized range-finder SVD (Halko/Martinsson/Tropp 2011; the
    * reference's svd_compressed solver, pca.py:276-281).
    *
    * Each pass is ONE treeAggregate over the rows computing, for the
    * current p×l projection P: G = (XP)ᵀ(XP) (l×l) and C = (XP)ᵀX
    * (l×p) — no n×l intermediate ever materializes, no shuffle. Power
    * iterations re-project through Cᵀ (orthonormalized on the driver).
    * Finally Q = XPR⁻¹ implicitly via Cholesky of G, B = QᵀX = R⁻ᵀC,
    * and the small l×p SVD runs on the driver. 1 + powerIter passes
    * instead of the full Gram's O(p²) aggregate state — the win when p
    * is large and k ≪ p.
    */
  private def fitRandomized(df: DataFrame, means: Array[Double]):
      (Array[Double], Array[Array[Double]], Long) = {
    import breeze.linalg.{cholesky, svd => bsvd, DenseMatrix => BDM}
    val p = featureCols.size
    val l = math.min(p, nComponents + oversample)
    val rnd = new scala.util.Random(seed)
    var proj = BDM.tabulate(p, l)((_, _) => rnd.nextGaussian())
    val rows = centeredRows(df, means)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var result: (BDM[Double], BDM[Double], Long) = null
    try {
      var pass = 0
      while (pass <= powerIter) {
        val bcP = df.sparkSession.sparkContext.broadcast(
          Array.tabulate(p, l)((i, j) => proj(i, j)))
        // one pass: G (l×l), C (l×p), count
        val (g, c, n) = rows.treeAggregate(
          (BDM.zeros[Double](l, l), BDM.zeros[Double](l, p), 0L))(
          seqOp = { case ((g0, c0, n0), x) =>
            val pm = bcP.value
            val y = new Array[Double](l)
            var j = 0
            while (j < l) {
              var i = 0; var s = 0.0
              while (i < p) { s += x(i) * pm(i)(j); i += 1 }
              y(j) = s; j += 1
            }
            var a = 0
            while (a < l) {
              val ya = y(a)
              var b = 0
              while (b < l) { g0(a, b) += ya * y(b); b += 1 }
              b = 0
              while (b < p) { c0(a, b) += ya * x(b); b += 1 }
              a += 1
            }
            (g0, c0, n0 + 1)
          },
          combOp = { case ((g1, c1, n1), (g2, c2, n2)) =>
            (g1 + g2, c1 + c2, n1 + n2) })
        if (pass == powerIter) result = (g, c, n)
        else {
          // power iteration: next projection = orthonormalized Cᵀ (p×l)
          val qr = breeze.linalg.qr.reduced(c.t)
          proj = qr.q
        }
        pass += 1
      }
      val (g, c, n) = result
      // Q = Y R⁻¹ with RᵀR = G; B = QᵀX = R⁻ᵀ C; SVD(B) = U S Vᵀ
      val b =
        try {
          val r = cholesky(g).t // upper
          breeze.linalg.inv(r.t) * c
        } catch { case _: Exception =>
          // G singular (rank-deficient Y): symmetric whitening
          // G^{-1/2} C via thresholded eigendecomposition
          val es = breeze.linalg.eigSym(g)
          val dinv = es.eigenvalues.map(e =>
            if (e > 1e-12) 1.0 / math.sqrt(e) else 0.0)
          (es.eigenvectors * breeze.linalg.diag(dinv) * es.eigenvectors.t) * c
        }
      val bsvd.SVD(_, s, vt) = bsvd.reduced(b)
      val v = Array.tabulate(nComponents)(j => Array.tabulate(p)(i => vt(j, i)))
      (s.toArray.take(nComponents), v, n)
    } finally rows.unpersist(blocking = false)
  }
}

class PCAModel(
    val featureCols: Seq[String],
    val means: Array[Double],
    val components: Array[Array[Double]], // [component][feature]
    val explainedVariance: Array[Double],
    val explainedVarianceRatio: Array[Double],
    val totalVariance: Double,
    val whiten: Boolean = false
) extends Model {

  /** Project onto components: k new columns pc_0..pc_{k-1}; pure column
    * math (no shuffle). With `whiten` (pca.py:379-381) each pc is divided
    * by √explained_variance so the projected columns have unit population
    * variance.
    */
  def transform(df: DataFrame): DataFrame =
    components.zipWithIndex.foldLeft(df) { case (d, (comp, j)) =>
      val proj = featureCols.zipWithIndex.map { case (c, i) =>
        (col(c) - lit(means(i))) * lit(comp(i))
      }.reduce(_ + _)
      val scaled =
        if (whiten) proj / lit(math.sqrt(explainedVariance(j))) else proj
      d.withColumn(s"pc_$j", scaled)
    }

  /** Reconstruct from the projection (inverse_transform). With `whiten`
    * the components are re-scaled by √explained_variance (pca.py:436-441)
    * — like the reference, this undoes the whitening scale but not the
    * rank-k truncation.
    */
  override def inverseTransform(df: DataFrame): DataFrame =
    featureCols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val recon = components.indices.map { j =>
        val loading =
          if (whiten) components(j)(i) * math.sqrt(explainedVariance(j))
          else components(j)(i)
        col(s"pc_$j") * lit(loading)
      }.reduce(_ + _) + lit(means(i))
      d.withColumn(c, recon)
    }.drop(components.indices.map(j => s"pc_$j"): _*)
}

/** Ref: dask_ml.decomposition.TruncatedSVD (truncated_svd.py:157-208) —
  * PCA without centering.
  */
class TruncatedSVD(featureCols: Seq[String], nComponents: Int)
    extends Estimator[PCAModel] {
  private val inner = new PCA(featureCols, nComponents, center = false)
  def fit(df: DataFrame): PCAModel = inner.fit(df)
}
