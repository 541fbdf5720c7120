package graft.ensemble

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.core.{Estimator, Model}
import graft.wrappers.{LocalEstimator, LocalModel}

/** Ref: dask_ml.ensemble.BlockwiseVotingClassifier / -Regressor
  * (ensemble/_blockwise.py:11-260).
  *
  * Fit: clone of the sub-estimator trained INDEPENDENTLY on each
  * partition (the reference's delayed per-block fits collected by one
  * `dask.compute`, _blockwise.py:23-47) — here one `mapPartitions` job
  * collecting the (small) fitted models to the driver.
  *
  * Predict: broadcast `Array[LocalModel]`; per row every model votes —
  * majority (classifier, `_vote_block`'s bincount-argmax,
  * _blockwise.py:273-290) or mean (regressor). One map-only stage.
  *
  * Scale: #models = #partitions; vote cost O(models) per row, so
  * partition counts in the thousands are fine; the models themselves
  * must be small (linear/NB-sized), same contract as the reference.
  */
abstract class BlockwiseVotingBase(
    val featureCols: Seq[String],
    val labelCol: String,
    val subEstimator: LocalEstimator
) {
  protected def collectRows(df: DataFrame): DataFrame =
    df.select((featureCols :+ labelCol).map(c => col(c).cast("double")): _*)

  protected def fitPerPartition(df: DataFrame): Array[LocalModel] = {
    val p = featureCols.size
    val est = subEstimator
    require(df.rdd.getNumPartitions <= 10000,
      s"${df.rdd.getNumPartitions} partitions => as many sub-models " +
        "collected to the driver; repartition first")
    val models = collectRows(df).rdd.mapPartitions { it =>
      val rows = it.toArray
      if (rows.isEmpty) Iterator.empty
      else {
        val xs = rows.map(r => Array.tabulate(p)(r.getDouble))
        val y = rows.map(_.getDouble(p))
        Iterator(est.fit(xs, y))
      }
    }.collect()
    require(models.nonEmpty, "no non-empty partitions to fit on")
    models
  }
}

class BlockwiseVotingRegressor(
    featureCols: Seq[String], labelCol: String, subEstimator: LocalEstimator
) extends BlockwiseVotingBase(featureCols, labelCol, subEstimator)
    with Estimator[BlockwiseVotingModel] {
  def fit(df: DataFrame): BlockwiseVotingModel =
    new BlockwiseVotingModel(featureCols, fitPerPartition(df), voteMode = "mean")
}

class BlockwiseVotingClassifier(
    featureCols: Seq[String], labelCol: String, subEstimator: LocalEstimator,
    val voting: String = "hard" // _blockwise.py:60: "hard" | "soft"
) extends BlockwiseVotingBase(featureCols, labelCol, subEstimator)
    with Estimator[BlockwiseVotingModel] {
  require(Seq("hard", "soft").contains(voting))
  def fit(df: DataFrame): BlockwiseVotingModel =
    new BlockwiseVotingModel(featureCols, fitPerPartition(df),
      voteMode = if (voting == "soft") "soft" else "majority")
}

class BlockwiseVotingModel(
    val featureCols: Seq[String],
    val estimators: Array[LocalModel],
    val voteMode: String,
    val predictionCol: String = "prediction"
) extends Model {

  def transform(df: DataFrame): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(estimators)
    val mode = voteMode
    val predictUdf = udf { xs: Seq[Double] =>
      val x = xs.toArray
      if (mode == "soft") { // argmax of mean proba (_blockwise.py soft arm)
        val mean = BlockwiseVotingModel.meanProba(bc.value, x)
        mean.indices.maxBy(mean(_)).toDouble
      } else {
        val votes = bc.value.map(_.predict(x))
        if (mode == "mean") votes.sum / votes.length
        else { // majority with lowest-label tie-break (bincount argmax)
          votes.groupBy(identity).toSeq
            .maxBy { case (label, vs) => (vs.length, -label) }._1
        }
      }
    }
    df.withColumn(predictionCol,
      predictUdf(array(featureCols.map(c => col(c).cast("double")): _*)))
  }

  /** Soft-voting class probabilities: the blockwise mean of the
    * sub-models' predict_proba (_blockwise.py:119-131) as
    * `proba_0..proba_{c-1}` columns.
    */
  def predictProba(df: DataFrame): DataFrame = {
    require(estimators.forall(_.hasProba),
      "predict_proba requires every sub-model to implement it")
    val bc = df.sparkSession.sparkContext.broadcast(estimators)
    val nClasses = estimators.head
      .predictProba(Array.fill(featureCols.size)(0.0)).length
    val f = udf { xs: Seq[Double] =>
      BlockwiseVotingModel.meanProba(bc.value, xs.toArray).toSeq
    }
    val withArr = df.withColumn("__proba",
      f(array(featureCols.map(c => col(c).cast("double")): _*)))
    (0 until nClasses).foldLeft(withArr)((d, c) =>
      d.withColumn(s"proba_$c", element_at(col("__proba"), c + 1)))
      .drop("__proba")
  }
}

object BlockwiseVotingModel {
  private[ensemble] def meanProba(models: Array[LocalModel],
      x: Array[Double]): Array[Double] = {
    val first = models(0).predictProba(x)
    val acc = first.clone()
    var m = 1
    while (m < models.length) {
      val p = models(m).predictProba(x)
      var c = 0
      while (c < acc.length) { acc(c) += p(c); c += 1 }
      m += 1
    }
    var c = 0
    while (c < acc.length) { acc(c) /= models.length; c += 1 }
    acc
  }
}
