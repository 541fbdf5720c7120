package graft.preprocessing

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Estimator, Model}

/** Ref: dask_ml.impute.SimpleImputer (impute.py:23-90).
  * strategy ∈ mean | median | most_frequent | constant. Fit is one
  * aggregate pass (mean), one approx/exact-quantile pass (median), or a
  * per-column top-1 groupBy (most_frequent, deterministic tie-break by
  * count desc then value asc). Transform = `coalesce(col, lit(stat))`,
  * the Catalyst form of `X.fillna(statistics_)` (impute.py:83-90).
  */
class SimpleImputer(
    val cols: Seq[String],
    val strategy: String = "mean",
    val fillValue: Option[Any] = None,
    val exact: Boolean = false
) extends Estimator[SimpleImputerModel] {

  def fit(df: DataFrame): SimpleImputerModel = {
    val stats: Map[String, Any] = strategy match {
      case "constant" =>
        val v = fillValue.getOrElse(
          throw new IllegalArgumentException("constant strategy requires fillValue"))
        cols.map(_ -> v).toMap
      case "mean" =>
        val row = df.agg(avg(col(cols.head)), cols.tail.map(c => avg(col(c))): _*).head()
        cols.zipWithIndex.map { case (c, i) => c -> row.getDouble(i) }.toMap
      case "median" =>
        if (exact)
          graft.core.Quantiles.exact(df, cols, Seq(0.5))
            .map { case (c, qs) => c -> (qs.head: Any) }
        else {
          val exprs = cols.map(c => percentile_approx(col(c), lit(0.5), lit(10000)))
          val row = df.agg(exprs.head, exprs.tail: _*).head()
          cols.zipWithIndex.map { case (c, i) => c -> row.getDouble(i) }.toMap
        }
      case "most_frequent" =>
        // One grouped count per column; K distinct values each — tiny
        // results, the scans run in parallel jobs only if asked; at scale
        // each is a single shuffle of partial counts.
        cols.map { c =>
          val top = df.filter(col(c).isNotNull).groupBy(col(c))
            .agg(count(lit(1)).as("cnt"))
            .orderBy(desc("cnt"), asc(c)).limit(1).head()
          c -> top.get(0)
        }.toMap
      case other => throw new IllegalArgumentException(s"unknown strategy: $other")
    }
    new SimpleImputerModel(cols, stats, strategy)
  }
}

class SimpleImputerModel(
    val cols: Seq[String],
    val statistics: Map[String, Any],
    val strategy: String
) extends Model {
  def transform(df: DataFrame): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, coalesce(col(c), lit(statistics(c))))
    }
}
