package graft.naivebayes

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Estimator, Model}

/** Ref: dask_ml.naive_bayes.GaussianNB (naive_bayes.py:30-120).
  *
  * Fit = ONE grouped aggregate: per class, count + per-feature mean and
  * population variance (the reference filters `X[y==c]` per class,
  * naive_bayes.py:41-52 — a groupBy expresses the same in one shuffle of
  * K·P partial aggregates instead of K passes). Collected model state is
  * K·P doubles — tiny.
  *
  * Predict = broadcast joint-log-likelihood column math + argmax
  * (naive_bayes.py:62-120), fully codegen'd, no shuffle.
  */
class GaussianNB(
    val featureCols: Seq[String],
    val labelCol: String,
    val varSmoothing: Double = 1e-9
) extends Estimator[GaussianNBModel] {

  def fit(df: DataFrame): GaussianNBModel = {
    val aggs: Seq[Column] = count(lit(1)).as("n") +:
      featureCols.flatMap(c => Seq(avg(col(c)).as(s"mean_$c"), var_pop(col(c)).as(s"var_$c")))
    // class-cardinality guard: a continuous label would otherwise
    // collect one row per distinct value to the driver
    val rows = df.groupBy(col(labelCol).cast("string").as("cls"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("cls").take(10001)
    require(rows.length <= 10000,
      s"$labelCol has more than 10000 distinct classes; GaussianNB needs a categorical label")
    val classes = rows.map(_.getString(0))
    val counts = rows.map(_.getLong(1))
    val total = counts.sum.toDouble
    val theta = rows.map(r => featureCols.indices.map(i => r.getDouble(2 + 2 * i)).toArray)
    val rawVar = rows.map(r => featureCols.indices.map(i => r.getDouble(3 + 2 * i)).toArray)
    // sklearn-style smoothing: +ε·max variance over all features
    val maxVar = rawVar.flatten.foldLeft(0.0)(math.max)
    val sigma = rawVar.map(_.map(_ + varSmoothing * maxVar))
    val priors = counts.map(_ / total)
    new GaussianNBModel(featureCols, labelCol, classes, priors, theta, sigma)
  }
}

class GaussianNBModel(
    val featureCols: Seq[String],
    val labelCol: String,
    val classes: Array[String],
    val classPrior: Array[Double],
    val theta: Array[Array[Double]],  // [class][feature] means
    val sigma: Array[Array[Double]],  // [class][feature] variances
    val predictionCol: String = "prediction"
) extends Model {

  /** log P(c) + Σ_f −0.5·(log(2πσ²) + (x−μ)²/σ²), one Column per class. */
  def jointLogLikelihood(cls: Int): Column = {
    val terms = featureCols.zipWithIndex.map { case (c, f) =>
      val mu = theta(cls)(f); val s2 = sigma(cls)(f)
      lit(-0.5 * math.log(2.0 * math.Pi * s2)) -
        pow(col(c) - lit(mu), 2) / lit(2.0 * s2)
    }
    terms.foldLeft(lit(math.log(classPrior(cls))): Column)(_ + _)
  }

  def transform(df: DataFrame): DataFrame = {
    val jlls = classes.indices.map(jointLogLikelihood)
    // argmax over the per-class likelihood array (first max wins, matching
    // np.argmax tie behavior)
    val arr = array(jlls: _*)
    val idx = array_position(arr, array_max(arr)).cast("int") - 1
    val clsExpr = element_at(array(classes.map(lit).toIndexedSeq: _*), idx + 1)
    df.withColumn(predictionCol, clsExpr)
  }

  /** P(c|x) via softmax of the joint log likelihoods. */
  def predictProba(df: DataFrame): DataFrame = {
    val jlls = classes.indices.map(jointLogLikelihood)
    val mx = greatest(jlls: _*)
    val exps = jlls.map(j => exp(j - mx))
    val z = exps.reduce(_ + _)
    classes.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      d.withColumn(s"proba_$c", exps(i) / z)
    }
  }
}
