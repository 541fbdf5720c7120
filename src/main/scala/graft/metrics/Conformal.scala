package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split conformal prediction for regression (Vovk et al.; Lei,
  * G'Sell, Rinaldo, Tibshirani & Wasserman, "Distribution-Free
  * Predictive Inference for Regression", JASA 2018) — the
  * distribution-free uncertainty wrapper a serving pipeline puts
  * around ANY point regressor: fit on a proper training split, take
  * the (1−α) quantile q̂ of absolute residuals on a held-out
  * CALIBRATION split, and ŷ ± q̂ then covers new points with
  * probability ≥ 1−α under exchangeability alone — no distributional
  * assumption about the model or the noise.
  *
  * Scale shape: the three splits are h60 hash buckets (pure map, no
  * shuffle to split); the fit is one aggregate (closed-form OLS via
  * regr_slope/regr_intercept); q̂ is one grouped-percentile aggregate
  * over the calibration split (exact percentile at gate scale — the
  * documented switch to percentile_approx at volume); coverage is one
  * aggregate over the test split against the broadcast 1-row (model,
  * q̂). Determinism: fitted coefficients and residual scores are
  * quantized to 6 decimals before the quantile, so an independent
  * engine replays q̂ and coverage exactly.
  */
object Conformal {

  /** @param key   unique row key (split assignment = h60 bucket mod 10:
    *              0-7 train, 8 calibration, 9 test)
    * @param alpha miscoverage level (interval level = 1−α)
    * @param finiteSample true → calibrate at the finite-sample-exact
    *   level ⌈(n_cal+1)(1−α)⌉ / n_cal (the conformal guarantee's
    *   form; needs one bounded driver count); false → the asymptotic
    *   level 1−α, which keeps the whole report a literal-parameter
    *   plan (the oracle-able gate form)
    * @return one row: (n_calib, n_test, qhat, coverage)
    */
  def splitConformalOls(df: DataFrame, xCol: String, yCol: String,
      key: Column, salt: String = "conf", alpha: Double = 0.1,
      finiteSample: Boolean = true): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    val bk = graft.core.Hashing.bucket(key, salt, 10)
    val b = df.select(col(xCol).cast("double").as("__x"),
      col(yCol).cast("double").as("__y"), bk.as("__bk"))
    val train = b.filter(col("__bk") <= 7)
    val calib = b.filter(col("__bk") === 8)
    val test = b.filter(col("__bk") === 9)

    val fit = train.agg(
      round(expr("regr_slope(__y, __x)"), 6).as("__m"),
      round(expr("regr_intercept(__y, __x)"), 6).as("__c"))
    // one SQL fragment shared by the quantile aggregate and the
    // coverage predicate so the two can never drift
    val scoreSql = "round(abs(__y - (__m * __x + __c)), 6)"
    def score: Column = expr(scoreSql)

    val level =
      if (!finiteSample) 1.0 - alpha
      else {
        val n = calib.count() // bounded: one long
        math.min(1.0, math.ceil((n + 1) * (1.0 - alpha)) / n)
      }
    val q = calib.crossJoin(broadcast(fit))
      .agg(count(lit(1)).as("n_calib"),
        round(expr(s"percentile($scoreSql, $level)"), 6).as("qhat"))
    test.crossJoin(broadcast(fit)).crossJoin(broadcast(q))
      .agg(first(col("n_calib")).as("n_calib"),
        count(lit(1)).as("n_test"),
        first(col("qhat")).as("qhat"),
        round(avg((score <= col("qhat")).cast("int")), 6).as("coverage"))
  }
}
