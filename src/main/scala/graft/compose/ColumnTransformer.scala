package graft.compose

import org.apache.spark.sql.DataFrame

import graft.core.{Estimator, Model}

/** Ref: dask_ml.compose.ColumnTransformer
  * (compose/_column_transformer.py:172-200): apply a different
  * estimator to each column subset and keep everything in one frame.
  *
  * Our transformers operate on named columns in place, so "hstack of
  * blocks" (dd.concat(axis=1)) is simply sequential application — no
  * join, no shuffle, one fused projection at execution time.
  */
class ColumnTransformer(
    val transformers: Seq[(String, Estimator[_ <: Model])]
) extends Estimator[ColumnTransformerModel] {
  def fit(df: DataFrame): ColumnTransformerModel =
    new ColumnTransformerModel(transformers.map { case (name, est) =>
      name -> est.fit(df)
    })
}

class ColumnTransformerModel(
    val fitted: Seq[(String, Model)]
) extends Model {
  def transform(df: DataFrame): DataFrame =
    fitted.foldLeft(df) { case (d, (_, m)) => m.transform(d) }
  override def inverseTransform(df: DataFrame): DataFrame =
    fitted.reverse.foldLeft(df) { case (d, (_, m)) => m.inverseTransform(d) }
  def apply(name: String): Model = fitted.find(_._1 == name).get._2
}

/** sklearn-style Pipeline: sequential estimator stages, each fitted on
  * the output of the previous (the reference reuses sklearn.Pipeline
  * directly; its graph form is in model_selection._search — see
  * PipelineGridSearchCV for the shared-prefix search).
  */
class Pipeline(val stages: Seq[(String, Estimator[_ <: Model])])
    extends Estimator[PipelineModel] {
  def fit(df: DataFrame): PipelineModel = {
    var cur = df
    val fitted = stages.map { case (name, est) =>
      val m = est.fit(cur)
      cur = m.transform(cur)
      name -> m
    }
    new PipelineModel(fitted)
  }
}

class PipelineModel(val fitted: Seq[(String, Model)]) extends Model {
  def transform(df: DataFrame): DataFrame =
    fitted.foldLeft(df) { case (d, (_, m)) => m.transform(d) }
  override def inverseTransform(df: DataFrame): DataFrame =
    fitted.reverse.foldLeft(df) { case (d, (_, m)) => m.inverseTransform(d) }
  def apply(name: String): Model = fitted.find(_._1 == name).get._2
}
