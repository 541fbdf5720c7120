package graft.wrappers

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}

/** In-JVM learners used where the reference broadcasts a fitted
  * sklearn estimator into blocks (wrappers.py) or `partial_fit`s it
  * sequentially (_partial.py). These run INSIDE executors on one
  * partition's rows — they are the "sub-estimator" of
  * BlockwiseVoting/Incremental, not distributed algorithms themselves.
  */
trait LocalModel extends Serializable {
  def predict(x: Array[Double]): Double
  /** Class-probability vector [P(class 0), P(class 1), ...] — the
    * sklearn `predict_proba` contract required by ParallelPostFit's
    * proba surface (wrappers.py:337-380). Classifiers override.
    */
  def predictProba(x: Array[Double]): Array[Double] =
    throw new UnsupportedOperationException(s"$this has no predict_proba")
  def hasProba: Boolean = false
}

trait LocalEstimator extends Serializable {
  def fit(xs: Array[Array[Double]], y: Array[Double]): LocalModel
}

/** Online learner with partial_fit semantics (the sklearn
  * `partial_fit` contract that `Incremental` requires, _partial.py:24-139),
  * generic in its state type.
  */
trait OnlineLearner[S] extends Serializable {
  def init(nFeatures: Int): S
  def partialFit(s: S, xs: Array[Array[Double]], y: Array[Double]): S
  def model(s: S): LocalModel
}

/** The weight-vector-state specialization used by SGD learners and the
  * adaptive searches (which inspect `OnlineState.seen`).
  */
trait OnlineEstimator extends OnlineLearner[OnlineState]

case class OnlineState(weights: Array[Double], intercept: Double, seen: Long)
    extends Serializable

case class LinearLocalModel(coef: Array[Double], intercept: Double,
    link: Double => Double = identity) extends LocalModel {
  def margin(x: Array[Double]): Double = {
    var s = intercept; var i = 0
    while (i < coef.length) { s += coef(i) * x(i); i += 1 }
    s
  }
  def predict(x: Array[Double]): Double = link(margin(x))
}

/** Binary logistic local model: predict = hard 0/1 at margin 0;
  * predict_proba = [1−σ, σ] (the reference's stack at
  * linear_model/utils.py:64-71).
  */
case class LogisticLocalModel(coef: Array[Double], intercept: Double)
    extends LocalModel {
  private val lin = LinearLocalModel(coef, intercept)
  def predict(x: Array[Double]): Double = if (lin.margin(x) > 0) 1.0 else 0.0
  override def predictProba(x: Array[Double]): Array[Double] = {
    val p = 1.0 / (1.0 + math.exp(-lin.margin(x)))
    Array(1.0 - p, p)
  }
  override def hasProba: Boolean = true
}

/** Exact in-memory OLS/ridge via Breeze (the local analog of
  * graft.linear.LinearRegression solver="normal").
  */
class LocalOLS(ridge: Double = 0.0) extends LocalEstimator {
  def fit(xs: Array[Array[Double]], y: Array[Double]): LocalModel = {
    val n = xs.length; val p = if (n == 0) 0 else xs(0).length
    require(n > 0, "empty partition")
    val xtx = BDM.zeros[Double](p + 1, p + 1)
    val xty = BDV.zeros[Double](p + 1)
    var r = 0
    while (r < n) {
      val row = xs(r)
      var i = 0
      while (i <= p) {
        val xi = if (i == p) 1.0 else row(i)
        xty(i) += xi * y(r)
        var j = i
        while (j <= p) {
          val xj = if (j == p) 1.0 else row(j)
          xtx(i, j) += xi * xj
          j += 1
        }
        i += 1
      }
      r += 1
    }
    for (i <- 0 to p; j <- 0 until i) xtx(i, j) = xtx(j, i)
    for (i <- 0 until p) xtx(i, i) += ridge
    // singular X'X (constant/collinear columns) → minimum-norm solution
    val beta =
      try xtx \ xty
      catch { case _: breeze.linalg.MatrixSingularException =>
        breeze.linalg.pinv(xtx) * xty }
    LinearLocalModel(Array.tabulate(p)(beta(_)), beta(p))
  }
}

/** SGD with constant-ish inverse-scaling learning rate; squared loss
  * (regressor) or logistic loss (classifier, labels 0/1). The online
  * learner for `Incremental`'s sequential block training.
  */
class LocalSGD(loss: String = "squared", eta0: Double = 0.01,
    seed: Long = 42) extends OnlineEstimator {

  def init(nFeatures: Int): OnlineState =
    OnlineState(Array.fill(nFeatures)(0.0), 0.0, 0L)

  def partialFit(s: OnlineState, xs: Array[Array[Double]], y: Array[Double]): OnlineState = {
    val w = s.weights.clone(); var b = s.intercept; var seen = s.seen
    val rnd = new scala.util.Random(seed + seen)
    val order = rnd.shuffle((0 until xs.length).toVector)
    for (r <- order) {
      val eta = eta0 / math.sqrt(1.0 + seen)
      val x = xs(r)
      var margin = b; var i = 0
      while (i < w.length) { margin += w(i) * x(i); i += 1 }
      val grad = loss match {
        case "squared" => margin - y(r)
        case "log" => 1.0 / (1.0 + math.exp(-margin)) - y(r)
      }
      i = 0
      while (i < w.length) { w(i) -= eta * grad * x(i); i += 1 }
      b -= eta * grad
      seen += 1
    }
    OnlineState(w, b, seen)
  }

  def model(s: OnlineState): LocalModel =
    if (loss == "log") LogisticLocalModel(s.weights, s.intercept)
    else LinearLocalModel(s.weights, s.intercept)
}

/** Accumulated normal-equation state: upper-triangular X'X (with the
  * intercept column appended), X'y, and the row count.
  */
case class OlsState(xtx: Array[Double], xty: Array[Double], seen: Long)
    extends Serializable

/** EXACT online OLS/ridge: partial_fit accumulates the Gram sums, so the
  * final model is the exact least-squares solution regardless of block
  * order or partitioning — the `partial_fit` analog of
  * graft.linear.LinearRegression solver="normal" (and of sklearn
  * estimators whose partial_fit is order-invariant). This makes
  * `Incremental(OnlineOLS)` deterministically equal to the closed-form
  * OLS, which the DuckDB regr_slope/regr_intercept oracle verifies.
  */
class OnlineOLS(ridge: Double = 0.0) extends OnlineLearner[OlsState] {
  def init(nFeatures: Int): OlsState = {
    val d = nFeatures + 1
    OlsState(new Array[Double](d * (d + 1) / 2), new Array[Double](d), 0L)
  }

  def partialFit(s: OlsState, xs: Array[Array[Double]], y: Array[Double]): OlsState = {
    val d = s.xty.length; val p = d - 1
    val xtx = s.xtx.clone(); val xty = s.xty.clone()
    var r = 0
    while (r < xs.length) {
      val row = xs(r); var idx = 0; var i = 0
      while (i < d) {
        val xi = if (i == p) 1.0 else row(i)
        xty(i) += xi * y(r)
        var j = i
        while (j < d) {
          val xj = if (j == p) 1.0 else row(j)
          xtx(idx) += xi * xj
          idx += 1; j += 1
        }
        i += 1
      }
      r += 1
    }
    OlsState(xtx, xty, s.seen + xs.length)
  }

  def model(s: OlsState): LocalModel = {
    val d = s.xty.length; val p = d - 1
    val m = BDM.zeros[Double](d, d)
    var idx = 0
    for (i <- 0 until d; j <- i until d) {
      m(i, j) = s.xtx(idx); m(j, i) = s.xtx(idx); idx += 1
    }
    for (i <- 0 until p) m(i, i) += ridge
    val beta =
      try m \ BDV(s.xty)
      catch { case _: breeze.linalg.MatrixSingularException =>
        breeze.linalg.pinv(m) * BDV(s.xty) }
    LinearLocalModel(Array.tabulate(p)(beta(_)), beta(p))
  }
}
