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
    featureCols: Seq[String], labelCol: String, subEstimator: LocalEstimator
) extends BlockwiseVotingBase(featureCols, labelCol, subEstimator)
    with Estimator[BlockwiseVotingModel] {
  def fit(df: DataFrame): BlockwiseVotingModel =
    new BlockwiseVotingModel(featureCols, fitPerPartition(df), voteMode = "majority")
}

class BlockwiseVotingModel(
    val featureCols: Seq[String],
    val estimators: Array[LocalModel],
    val voteMode: String,
    val predictionCol: String = "prediction"
) extends Model {

  def transform(df: DataFrame): DataFrame = {
    val p = featureCols.size
    val bc = df.sparkSession.sparkContext.broadcast(estimators)
    val mode = voteMode
    val predictUdf = udf { xs: Seq[Double] =>
      val x = xs.toArray
      val votes = bc.value.map(_.predict(x))
      if (mode == "mean") votes.sum / votes.length
      else { // majority with lowest-label tie-break (bincount argmax)
        votes.groupBy(identity).toSeq
          .maxBy { case (label, vs) => (vs.length, -label) }._1
      }
    }
    df.withColumn(predictionCol,
      predictUdf(array(featureCols.map(c => col(c).cast("double")): _*)))
  }
}
