package graft.preprocessing

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Estimator, Model, util}

/** Column scalers over named numeric columns (the reference's DataFrame
  * mode). Fit is ONE aggregate pass — Catalyst fuses all per-column
  * statistics into a single partial+final hash aggregate, the same
  * single-`compute()` batching the reference does at
  * preprocessing/data.py:85. Transform is pure column arithmetic
  * (whole-stage codegen; at 100 TB this pipelines into the scan with no
  * shuffle at all).
  */

/** Ref: dask_ml.preprocessing.StandardScaler (preprocessing/data.py:51-117).
  * Population variance (ddof=0) like the reference's `nanvar` default;
  * null/NaN rows are skipped by Spark aggregates like `nanmean`.
  */
class StandardScaler(
    val cols: Seq[String],
    val withMean: Boolean = true,
    val withStd: Boolean = true
) extends Estimator[StandardScalerModel] {
  def fit(df: DataFrame): StandardScalerModel = {
    val stats = util.aggRow(df, cols.flatMap(c =>
      Seq(avg(col(c)), sqrt(var_pop(col(c))))))
    val means = cols.indices.map(i => stats(2 * i)).toArray
    val scales = cols.indices.map(i => util.handleZeroInScale(stats(2 * i + 1))).toArray
    new StandardScalerModel(cols, means, scales, withMean, withStd)
  }
}

class StandardScalerModel(
    val cols: Seq[String],
    val means: Array[Double],
    val scales: Array[Double],
    val withMean: Boolean,
    val withStd: Boolean
) extends Model {
  def transform(df: DataFrame): DataFrame =
    cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val centered = if (withMean) col(c) - lit(means(i)) else col(c)
      d.withColumn(c, if (withStd) centered / lit(scales(i)) else centered)
    }
  override def inverseTransform(df: DataFrame): DataFrame =
    cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val unscaled = if (withStd) col(c) * lit(scales(i)) else col(c)
      d.withColumn(c, if (withMean) unscaled + lit(means(i)) else unscaled)
    }
}

/** Ref: dask_ml.preprocessing.MinMaxScaler (preprocessing/data.py:123-198). */
class MinMaxScaler(
    val cols: Seq[String],
    val featureRange: (Double, Double) = (0.0, 1.0)
) extends Estimator[MinMaxScalerModel] {
  def fit(df: DataFrame): MinMaxScalerModel = {
    val stats = util.aggRow(df, cols.flatMap(c => Seq(min(col(c)), max(col(c)))))
    val mins = cols.indices.map(i => stats(2 * i)).toArray
    val maxs = cols.indices.map(i => stats(2 * i + 1)).toArray
    new MinMaxScalerModel(cols, mins, maxs, featureRange)
  }
}

class MinMaxScalerModel(
    val cols: Seq[String],
    val dataMin: Array[Double],
    val dataMax: Array[Double],
    val featureRange: (Double, Double)
) extends Model {
  private val (lo, hi) = featureRange
  def transform(df: DataFrame): DataFrame =
    cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val scale = util.handleZeroInScale(dataMax(i) - dataMin(i))
      d.withColumn(c, (col(c) - lit(dataMin(i))) / lit(scale) * lit(hi - lo) + lit(lo))
    }
  override def inverseTransform(df: DataFrame): DataFrame =
    cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val scale = util.handleZeroInScale(dataMax(i) - dataMin(i))
      d.withColumn(c, (col(c) - lit(lo)) / lit(hi - lo) * lit(scale) + lit(dataMin(i)))
    }
}

/** Ref: dask_ml.preprocessing.RobustScaler (preprocessing/data.py:210-300).
  * The reference uses approximate percentiles (`da.percentile`, noted at
  * data.py:303-308); `exact=false` mirrors that with Spark's
  * Greenwald-Khanna `approx_percentile` (the 100 TB path — single pass,
  * bounded memory), `exact=true` uses exact `percentile` for
  * oracle-reproducible tests.
  */
class RobustScaler(
    val cols: Seq[String],
    val withCentering: Boolean = true,
    val withScaling: Boolean = true,
    val quantileRange: (Double, Double) = (25.0, 75.0),
    val exact: Boolean = false
) extends Estimator[RobustScalerModel] {
  def fit(df: DataFrame): RobustScalerModel = {
    val (qlo, qhi) = (quantileRange._1 / 100.0, quantileRange._2 / 100.0)
    val (centers, scales) =
      if (exact) {
        // exact quantiles for every column in ONE aggregate pass
        val qs = graft.core.Quantiles.exactOnePass(df, cols, Seq(0.5, qlo, qhi))
        (cols.map(c => qs(c)(0)).toArray,
          cols.map(c => util.handleZeroInScale(qs(c)(2) - qs(c)(1))).toArray)
      } else {
        val stats = util.aggRow(df, cols.flatMap(c => Seq(
          percentile_approx(col(c), lit(0.5), lit(10000)),
          percentile_approx(col(c), lit(qlo), lit(10000)),
          percentile_approx(col(c), lit(qhi), lit(10000)))))
        (cols.indices.map(i => stats(3 * i)).toArray,
          cols.indices.map(i =>
            util.handleZeroInScale(stats(3 * i + 2) - stats(3 * i + 1))).toArray)
      }
    new RobustScalerModel(cols, centers, scales, withCentering, withScaling)
  }
}

class RobustScalerModel(
    val cols: Seq[String],
    val centers: Array[Double],
    val scales: Array[Double],
    val withCentering: Boolean,
    val withScaling: Boolean
) extends Model {
  def transform(df: DataFrame): DataFrame =
    cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val centered = if (withCentering) col(c) - lit(centers(i)) else col(c)
      d.withColumn(c, if (withScaling) centered / lit(scales(i)) else centered)
    }
  override def inverseTransform(df: DataFrame): DataFrame =
    cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val unscaled = if (withScaling) col(c) * lit(scales(i)) else col(c)
      d.withColumn(c, if (withCentering) unscaled + lit(centers(i)) else unscaled)
    }
}
