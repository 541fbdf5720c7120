package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Metric functions as single-pass DataFrame aggregates
  * (ref: dask_ml/metrics/). Each is one `agg` → one partial+final
  * hash-aggregate job; optionally sample-weighted. The reference computes
  * these as dask reductions (e.g. regression.py:34-59); in Spark the
  * entire metric fuses into one codegen'd pass over the scan.
  */
object Metrics {

  private def weighted(err: Column, weight: Option[Column]): Column =
    weight match {
      case Some(w) => sum(err * w) / sum(w)
      case None => avg(err)
    }

  // ---- regression (ref: metrics/regression.py) ----

  /** regression.py:34-59; squared=false → RMSE. */
  def meanSquaredError(df: DataFrame, yTrue: String, yPred: String,
      sampleWeight: Option[String] = None, squared: Boolean = true): Double = {
    val mse = df.agg(weighted(pow(col(yPred) - col(yTrue), 2),
      sampleWeight.map(col))).head().getDouble(0)
    if (squared) mse else math.sqrt(mse)
  }

  /** regression.py:62-84. */
  def meanAbsoluteError(df: DataFrame, yTrue: String, yPred: String,
      sampleWeight: Option[String] = None): Double =
    df.agg(weighted(abs(col(yPred) - col(yTrue)), sampleWeight.map(col)))
      .head().getDouble(0)

  /** regression.py:87-147: |err| / max(|y|, eps). */
  def meanAbsolutePercentageError(df: DataFrame, yTrue: String, yPred: String,
      sampleWeight: Option[String] = None): Double = {
    val eps = 2.220446049250313e-16 // np.finfo(np.float64).eps
    df.agg(weighted(abs(col(yPred) - col(yTrue)) / greatest(abs(col(yTrue)), lit(eps)),
      sampleWeight.map(col))).head().getDouble(0)
  }

  /** regression.py:150-174 with the 0/0→1, den=0→0 guards. Single pass:
    * ss_tot via the sum-of-squares identity (no global window, which
    * would collapse to one partition at scale).
    */
  def r2Score(df: DataFrame, yTrue: String, yPred: String): Double = {
    val row = df.agg(
      sum(pow(col(yTrue) - col(yPred), 2)),
      sum(pow(col(yTrue), 2)), sum(col(yTrue)), count(lit(1))).head()
    val num = row.getDouble(0)
    val den = row.getDouble(1) - math.pow(row.getDouble(2), 2) / row.getLong(3)
    if (den == 0.0) { if (num == 0.0) 1.0 else 0.0 } else 1.0 - num / den
  }

  /** regression.py:177-192: MSE on log1p. */
  def meanSquaredLogError(df: DataFrame, yTrue: String, yPred: String,
      sampleWeight: Option[String] = None): Double =
    df.agg(weighted(pow(log1p(col(yPred)) - log1p(col(yTrue)), 2),
      sampleWeight.map(col))).head().getDouble(0)

  // ---- classification (ref: metrics/classification.py) ----

  /** classification.py:12-94. normalize=false returns the raw hit count. */
  def accuracyScore(df: DataFrame, yTrue: String, yPred: String,
      sampleWeight: Option[String] = None, normalize: Boolean = true): Double = {
    val hit = when(col(yTrue) === col(yPred), 1.0).otherwise(0.0)
    val agg = (sampleWeight, normalize) match {
      case (Some(w), true) => sum(hit * col(w)) / sum(col(w))
      case (Some(w), false) => sum(hit * col(w))
      case (None, true) => avg(hit)
      case (None, false) => sum(hit)
    }
    df.agg(agg).head().getDouble(0)
  }

  /** classification.py:97-153 — binary log loss on a probability column
    * (probability of the positive class), clipped like sklearn.
    */
  def logLoss(df: DataFrame, yTrue: String, probCol: String,
      sampleWeight: Option[String] = None, eps: Double = 1e-15): Double = {
    val p = least(greatest(col(probCol), lit(eps)), lit(1 - eps))
    val y = col(yTrue).cast("double")
    val ll = -(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p))
    df.agg(weighted(ll, sampleWeight.map(col))).head().getDouble(0)
  }

  /** classification.py:97-153 — MULTICLASS log loss: `yTrue` is a class
    * index, `probsCol` an array<double> of per-class scores. Like
    * sklearn: clip each probability to [eps, 1−eps], renormalize the row
    * to sum 1, then −log p(true class), sample-weighted mean. One fused
    * aggregate pass.
    */
  def logLossMulti(df: DataFrame, yTrue: String, probsCol: String,
      sampleWeight: Option[String] = None, eps: Double = 1e-15): Double = {
    val clipped = transform(col(probsCol),
      p => least(greatest(p, lit(eps)), lit(1 - eps)))
    val total = aggregate(clipped, lit(0.0), (acc, p) => acc + p)
    val py = element_at(clipped, col(yTrue).cast("int") + 1) / total
    df.agg(weighted(-log(py), sampleWeight.map(col))).head().getDouble(0)
  }

  // ---- r2 without a window (exposed for the query pack) ----
  /** Two-aggregate single-pass r2: E[y], E[y²], E[(y-p)²]. */
  def r2Expr(yTrue: Column, yPred: Column): Column = {
    val ssRes = sum(pow(yTrue - yPred, 2))
    val ssTot = sum(pow(yTrue, 2)) - pow(sum(yTrue), 2) / count(lit(1))
    lit(1.0) - ssRes / ssTot
  }
}

/** Ref: dask_ml.metrics.scorer (metrics/scorer.py:8-77): name → scorer
  * registry. Scorers take (df, yTrue, yPred-or-prob) and return Double,
  * greater-is-better (negated where sklearn negates).
  */
object Scorer {
  type ScoreFn = (DataFrame, String, String) => Double

  val scorers: Map[String, ScoreFn] = Map(
    "accuracy" -> ((df, t, p) => Metrics.accuracyScore(df, t, p)),
    "neg_mean_squared_error" -> ((df, t, p) => -Metrics.meanSquaredError(df, t, p)),
    "neg_root_mean_squared_error" ->
      ((df, t, p) => -Metrics.meanSquaredError(df, t, p, squared = false)),
    "neg_mean_absolute_error" -> ((df, t, p) => -Metrics.meanAbsoluteError(df, t, p)),
    "neg_mean_squared_log_error" -> ((df, t, p) => -Metrics.meanSquaredLogError(df, t, p)),
    "r2" -> ((df, t, p) => Metrics.r2Score(df, t, p)),
    "neg_log_loss" -> ((df, t, p) => -Metrics.logLoss(df, t, p))
  )

  def getScorer(name: String): ScoreFn =
    scorers.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown scorer $name; known: ${scorers.keys.mkString(", ")}"))
}
