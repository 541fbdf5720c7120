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
}

trait LocalEstimator extends Serializable {
  def fit(xs: Array[Array[Double]], y: Array[Double]): LocalModel
}

/** Online learner with partial_fit semantics (the sklearn
  * `partial_fit` contract that `Incremental` requires, _partial.py:24-139).
  */
trait OnlineEstimator extends Serializable {
  def init(nFeatures: Int): OnlineState
  def partialFit(s: OnlineState, xs: Array[Array[Double]], y: Array[Double]): OnlineState
  def model(s: OnlineState): LocalModel
}

case class OnlineState(weights: Array[Double], intercept: Double, seen: Long)
    extends Serializable

case class LinearLocalModel(coef: Array[Double], intercept: Double,
    link: Double => Double = identity) extends LocalModel {
  def predict(x: Array[Double]): Double = {
    var s = intercept; var i = 0
    while (i < coef.length) { s += coef(i) * x(i); i += 1 }
    link(s)
  }
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
    if (loss == "log")
      LinearLocalModel(s.weights, s.intercept,
        m => if (m > 0) 1.0 else 0.0)
    else LinearLocalModel(s.weights, s.intercept)
}
