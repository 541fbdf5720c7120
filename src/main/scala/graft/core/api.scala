package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Minimal estimator API mirroring the reference's sklearn triple
  * (fit / transform / inverse_transform) in MLlib convention: an
  * [[Estimator]] is immutable config, `fit` returns an immutable [[Model]]
  * holding only small learned state (vectors of per-column statistics —
  * never O(N) data), and `transform` is a lazy DataFrame→DataFrame map
  * that stays inside Catalyst (pure Column expressions, codegen-friendly,
  * no UDFs on the hot path).
  *
  * Reference shape: dask_ml estimators compute lazy per-column aggregates
  * and `compute()` them once in `fit` (e.g. preprocessing/data.py:51-96),
  * then transform blockwise; here the aggregate pass is `df.agg(...)` and
  * the blockwise transform is a column expression.
  */
trait Transformer extends Serializable {
  def transform(df: DataFrame): DataFrame
}

trait Model extends Transformer {
  /** Exact algebraic inverse where one exists (scalers, encoders). */
  def inverseTransform(df: DataFrame): DataFrame =
    throw new UnsupportedOperationException(s"$this has no inverse_transform")
}

trait Estimator[M <: Model] extends Serializable {
  def fit(df: DataFrame): M
  def fitTransform(df: DataFrame): DataFrame = fit(df).transform(df)
}

object util {
  /** dask_ml.utils.handle_zeros_in_scale (utils.py:74-80): a zero scale
    * (constant column) divides by 1 instead of 0.
    */
  def handleZeroInScale(s: Double): Double = if (s == 0.0) 1.0 else s

  /** Single-pass collection of one aggregate per (column, statistic). */
  def aggRow(df: DataFrame, exprs: Seq[Column]): Array[Double] = {
    val row = df.agg(exprs.head, exprs.tail: _*).head()
    (0 until row.length).map { i =>
      if (row.isNullAt(i)) Double.NaN else row.getDouble(i)
    }.toArray
  }
}
