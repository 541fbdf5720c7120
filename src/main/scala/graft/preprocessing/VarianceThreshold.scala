package graft.preprocessing

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature selector that removes low-variance columns — the sklearn
  * `VarianceThreshold` surface (the reference's preprocessing family
  * stops at scalers/encoders; this is the one selector a wide-feature
  * pipeline needs before a distributed fit). Fit is ONE aggregate row
  * over the corpus (population variance per column, the sklearn
  * convention); transform is a driver-side column projection — zero
  * jobs, zero shuffle at any scale.
  */
class VarianceThreshold(val cols: Seq[String], val threshold: Double = 0.0) {
  require(cols.nonEmpty, "need at least one column")
  require(threshold >= 0, s"threshold must be >= 0, got $threshold")

  def fit(df: DataFrame): VarianceThresholdModel = {
    val row = df.agg(
      var_pop(col(cols.head).cast("double")).as(cols.head),
      cols.tail.map(c => var_pop(col(c).cast("double")).as(c)): _*).head()
    val variances = cols.map(c => c -> row.getAs[Double](c))
    new VarianceThresholdModel(variances, threshold)
  }
}

class VarianceThresholdModel(val variances: Seq[(String, Double)],
    val threshold: Double) extends Serializable {

  /** Columns whose variance exceeds the threshold (sklearn keeps
    * strictly-greater when threshold > 0; == 0 keeps nonconstant).
    */
  val kept: Seq[String] =
    variances.collect { case (c, v) if v > threshold => c }

  require(kept.nonEmpty,
    s"no feature meets variance threshold $threshold")

  def transform(df: DataFrame): DataFrame = df.select(kept.map(col): _*)
}
