package graft.preprocessing

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Estimator, Model}

/** Ref: dask_ml.preprocessing.QuantileTransformer
  * (preprocessing/data.py:303-418). Fit: per-column quantiles at
  * `nQuantiles` evenly spaced references — ONE aggregate job for ALL
  * columns via `percentile_approx(col, array<ref>)` (the reference
  * likewise fits on approximate `da.percentile`, data.py:343-349);
  * `exact=true` swaps in the builtin exact `percentile` (same single
  * job) for oracle-reproducible results. Transform: per value,
  * two-sided linear interpolation into the fitted quantile table
  * (data.py:351-418's double `np.interp`), optionally mapped through the
  * normal PPF. The interpolation is a primitive-specialized scalar UDF
  * (binary search over the small broadcast table, no boxing in the
  * loop); nulls short-circuit in a codegen'd `when` before the UDF —
  * a map-only stage, embarrassingly parallel at any scale.
  */
class QuantileTransformer(
    val cols: Seq[String],
    val nQuantiles: Int = 1000,
    val outputDistribution: String = "uniform",
    val exact: Boolean = false,
    val accuracy: Int = 10000
) extends Estimator[QuantileTransformerModel] {
  require(Seq("uniform", "normal").contains(outputDistribution))

  def fit(df: DataFrame): QuantileTransformerModel = {
    val refs = (0 until nQuantiles).map(_.toDouble / (nQuantiles - 1))
    val tables =
      if (exact) graft.core.Quantiles.exactOnePass(df, cols, refs)
      else graft.core.Quantiles.approxOnePass(df, cols, refs, accuracy)
    new QuantileTransformerModel(cols, refs.toArray,
      cols.map(tables(_)).toArray, outputDistribution)
  }
}

class QuantileTransformerModel(
    val cols: Seq[String],
    val references: Array[Double],
    val quantiles: Array[Array[Double]],
    val outputDistribution: String
) extends Model {
  import QuantileTransformerModel._

  def transform(df: DataFrame): DataFrame =
    cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val qs = quantiles(i)
      val refs = references
      val n = qs.length
      // the descending-side knot arrays are per-MODEL state, hoisted out
      // of the per-row path
      val negQs = Array.tabulate(n)(j => -qs(n - 1 - j))
      val revYs = Array.tabulate(n)(j => 1.0 - refs(n - 1 - j))
      // two-sided np.interp as native codegen expressions
      // (graft.functions.Interp1D) — the whole transform stays one
      // WholeStageCodegen span, no UDF boundary
      val x = col(c).cast("double")
      val fwd = graft.functions.Interp1D(x, qs, refs)
      val bwd = lit(1.0) - graft.functions.Interp1D(-x, negQs, revYs)
      val u = lit(0.5) * (fwd + bwd)
      val out =
        if (outputDistribution == "normal") {
          // PPF tail stays a primitive UDF (rational approximation)
          val ppf = udf { (v: Double) =>
            normalPpf(math.min(math.max(v, 1e-7), 1 - 1e-7)) }
          ppf(u)
        } else u
      d.withColumn(c,
        when(col(c).isNull, lit(null).cast("double")).otherwise(out))
    }
}

object QuantileTransformerModel {
  /** sklearn's flat-region-stable interpolation:
    * 0.5·(interp(x, q, r) + 1 − interp(−x, −rev q, rev(1−r))).
    * (Kept for tests; `transform` inlines it with hoisted knot arrays.)
    */
  private[preprocessing] def interpTwoSided(
      x: Double, qs: Array[Double], refs: Array[Double]): Double = {
    val n = qs.length
    val negQs = Array.tabulate(n)(j => -qs(n - 1 - j))
    val revYs = Array.tabulate(n)(j => 1.0 - refs(n - 1 - j))
    val fwd = interp(x, qs, refs)
    val bwd = 1.0 - interp(-x, negQs, revYs)
    0.5 * (fwd + bwd)
  }

  private[preprocessing] def interp(x: Double, xs: Array[Double],
      ys: Array[Double]): Double = {
    val n = xs.length
    if (x <= xs(0)) return ys(0)
    if (x >= xs(n - 1)) return ys(n - 1)
    var lo = 0; var hi = n - 1
    while (hi - lo > 1) {
      val mid = (lo + hi) >>> 1
      if (xs(mid) <= x) lo = mid else hi = mid
    }
    if (xs(hi) == xs(lo)) ys(lo)
    else ys(lo) + (ys(hi) - ys(lo)) * (x - xs(lo)) / (xs(hi) - xs(lo))
  }

  /** Inverse normal CDF — Acklam's rational approximation (|ε|<1.15e-9),
    * public algorithm; same role as scipy.stats.norm.ppf in the reference.
    */
  private[preprocessing] def normalPpf(p: Double): Double = {
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val plow = 0.02425
    if (p < plow) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    } else if (p <= 1 - plow) {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else {
      val q = math.sqrt(-2 * math.log(1 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    }
  }
}
