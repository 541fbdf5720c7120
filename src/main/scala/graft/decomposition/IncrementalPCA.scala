package graft.decomposition

import breeze.linalg.{eigSym, DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Estimator, Model}

/** Ref: dask_ml.decomposition.IncrementalPCA (incremental_pca.py:36-370)
  * and the mean/variance merge in decomposition/extmath.py:19-108
  * (`_incremental_mean_and_var`, Chan/Golub/LeVeque 1982).
  *
  * The reference folds batches sequentially: merge running
  * (n, mean, M2) with each block's moments, then update an SVD. The
  * CGL merge is ASSOCIATIVE, so in Spark the same math runs as one
  * `treeAggregate`: each partition accumulates its own (n, mean, M2)
  * co-moment state and states merge pairwise up the tree — one pass,
  * no shuffle, no sequential chain, identical final moments. The
  * eigendecomposition of the merged p×p covariance happens once on the
  * driver (p ≲ 10³, same contract as PCA's Gram path).
  *
  * Resulting components/explained variance match batch [[PCA]] up to
  * sign (the reference's own test invariant); `svd_flip` sign fixing
  * applied the same way.
  */
object Moments {
  /** (count, mean vector, co-moment matrix M2 = Σ (x−µ)(x−µ)ᵀ). */
  final case class State(n: Long, mean: Array[Double], m2: Array[Array[Double]])
      extends Serializable

  def zero(p: Int): State =
    State(0L, new Array[Double](p), Array.fill(p)(new Array[Double](p)))

  /** Fold one row into the state (Welford step, extmath.py:61-77). */
  def add(s: State, x: Array[Double]): State = {
    val p = x.length
    val n1 = s.n + 1
    val mean = s.mean; val m2 = s.m2
    var i = 0
    val delta = new Array[Double](p)
    while (i < p) { delta(i) = x(i) - mean(i); i += 1 }
    i = 0
    while (i < p) {
      mean(i) += delta(i) / n1
      i += 1
    }
    // M2 += delta · (x − new mean)ᵀ (symmetric rank-1 update)
    i = 0
    while (i < p) {
      var j = 0
      while (j < p) {
        m2(i)(j) += delta(i) * (x(j) - mean(j))
        j += 1
      }
      i += 1
    }
    State(n1, mean, m2)
  }

  /** CGL pairwise merge (extmath.py:79-108). */
  def merge(a: State, b: State): State = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    val p = a.mean.length
    val n = a.n + b.n
    val mean = new Array[Double](p)
    val delta = new Array[Double](p)
    var i = 0
    while (i < p) {
      delta(i) = b.mean(i) - a.mean(i)
      mean(i) = a.mean(i) + delta(i) * b.n / n
      i += 1
    }
    val w = a.n.toDouble * b.n / n
    val m2 = Array.tabulate(p, p)((i2, j2) =>
      a.m2(i2)(j2) + b.m2(i2)(j2) + delta(i2) * delta(j2) * w)
    State(n, mean, m2)
  }
}

class IncrementalPCA(
    val featureCols: Seq[String],
    val nComponents: Int
) extends Estimator[IncrementalPCAModel] {
  require(nComponents >= 1 && nComponents <= featureCols.size)

  def fit(df: DataFrame): IncrementalPCAModel = {
    val p = featureCols.size
    val rows = df.select(featureCols.map(c => col(c).cast("double")): _*)
      .rdd.map(r => Array.tabulate(p)(r.getDouble))
    val state = rows.treeAggregate(Moments.zero(p))(Moments.add, Moments.merge)
    require(state.n > 0, "empty input")
    val n = state.n
    // population covariance (match PCA's ddof=0 convention)
    val cov = BDM.tabulate(p, p)((i, j) => state.m2(i)(j) / n)
    val es = eigSym(cov) // ascending eigenvalues
    val order = (0 until p).sortBy(i => -es.eigenvalues(i)).take(nComponents)
    val ev = order.map(es.eigenvalues(_)).toArray
    val components = order.map { j =>
      val comp = Array.tabulate(p)(i => es.eigenvectors(i, j))
      val mx = comp.indices.maxBy(i => math.abs(comp(i)))
      if (comp(mx) < 0) comp.map(-_) else comp
    }.toArray
    val totalVar = (0 until p).map(i => state.m2(i)(i) / n).sum
    new IncrementalPCAModel(featureCols, state.mean, components, ev,
      ev.map(_ / totalVar), totalVar, n)
  }
}

/** Same transform surface as PCAModel plus the incremental attributes
  * (`n_samples_seen_`, `singular_values_`, incremental_pca.py:120-143).
  */
class IncrementalPCAModel(
    featureCols: Seq[String],
    means: Array[Double],
    components: Array[Array[Double]],
    explainedVariance: Array[Double],
    explainedVarianceRatio: Array[Double],
    totalVariance: Double,
    val nSamplesSeen: Long
) extends PCAModel(featureCols, means, components, explainedVariance,
    explainedVarianceRatio, totalVariance) {
  def singularValues: Array[Double] =
    explainedVariance.map(ev => math.sqrt(ev * nSamplesSeen))
}
