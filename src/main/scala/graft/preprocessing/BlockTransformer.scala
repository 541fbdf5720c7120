package graft.preprocessing

import org.apache.spark.sql.DataFrame

import graft.core.Model

/** Ref: dask_ml.preprocessing.BlockTransformer
  * (preprocessing/_block_transformer.py:13-108): wrap an arbitrary
  * stateless function as a transformer. In Spark the "block" is the whole
  * lazy DataFrame — a Column-expression-based `f` stays fully
  * distributed and codegen'd; `mapPartitions`-based `f` degrades to the
  * reference's per-block semantics.
  */
class BlockTransformer(f: DataFrame => DataFrame) extends Model {
  def transform(df: DataFrame): DataFrame = f(df)
}
