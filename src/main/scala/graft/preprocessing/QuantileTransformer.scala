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
        if (outputDistribution == "normal")
          // native codegen PPF (graft.functions.NormalPpf) — the whole
          // normal-mode transform is one WholeStageCodegen span, UDF-free
          graft.functions.NormalPpf(u)
        else u
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
    * public algorithm; same role as scipy.stats.norm.ppf in the
    * reference. Delegates to the native codegen expression's static
    * kernel (graft.functions.NormalPpf) so eval and generated code share
    * one implementation.
    */
  private[preprocessing] def normalPpf(p: Double): Double =
    graft.functions.NormalPpf.ppf(p)
}
