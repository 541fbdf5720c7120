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
    val center: Boolean = true
) extends Estimator[PCAModel] {
  require(nComponents >= 1 && nComponents <= featureCols.size)

  def fit(df: DataFrame): PCAModel = {
    val p = featureCols.size
    val means =
      if (center) util.aggRow(df, featureCols.map(c => avg(col(c))))
      else Array.fill(p)(0.0)
    val rows = df.select(featureCols.map(col): _*).rdd.map { r =>
      OldVectors.dense(Array.tabulate(p)(i =>
        (r.get(i) match {
          case d: Double => d
          case f: Float => f.toDouble
          case i2: Int => i2.toDouble
          case l: Long => l.toDouble
          case n: Number => n.doubleValue()
        }) - means(i)))
    }
    val mat = new RowMatrix(rows)
    val n = mat.numRows()
    val svd = mat.computeSVD(nComponents, computeU = false)
    // singular values → explained variance: s²/n (ddof=0 population, like
    // the reference's da.var over centered data)
    val ev = svd.s.toArray.map(s => s * s / n)
    // total variance from a second tiny agg (sum of per-column var)
    val totalVar =
      if (center) util.aggRow(df, featureCols.map(c => var_pop(col(c)))).sum
      else util.aggRow(df, featureCols.map(c => avg(col(c) * col(c)))).sum
    // components: V columns → rows; sign-stabilize: largest-|loading|
    // coordinate made positive (svd_flip analog)
    val v = svd.V // p x k
    val components = Array.tabulate(nComponents) { j =>
      val comp = Array.tabulate(p)(i => v(i, j))
      val mx = comp.indices.maxBy(i => math.abs(comp(i)))
      if (comp(mx) < 0) comp.map(-_) else comp
    }
    new PCAModel(featureCols, means, components, ev, ev.map(_ / totalVar), totalVar)
  }
}

class PCAModel(
    val featureCols: Seq[String],
    val means: Array[Double],
    val components: Array[Array[Double]], // [component][feature]
    val explainedVariance: Array[Double],
    val explainedVarianceRatio: Array[Double],
    val totalVariance: Double
) extends Model {

  /** Project onto components: k new columns pc_0..pc_{k-1}; pure column
    * math (no shuffle).
    */
  def transform(df: DataFrame): DataFrame =
    components.zipWithIndex.foldLeft(df) { case (d, (comp, j)) =>
      val proj = featureCols.zipWithIndex.map { case (c, i) =>
        (col(c) - lit(means(i))) * lit(comp(i))
      }.reduce(_ + _)
      d.withColumn(s"pc_$j", proj)
    }

  /** Reconstruct from the projection (inverse_transform). */
  override def inverseTransform(df: DataFrame): DataFrame =
    featureCols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val recon = components.indices.map(j =>
        col(s"pc_$j") * lit(components(j)(i))).reduce(_ + _) + lit(means(i))
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
