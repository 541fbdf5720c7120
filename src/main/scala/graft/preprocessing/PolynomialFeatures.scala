package graft.preprocessing

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Estimator, Model}

/** Ref: dask_ml.preprocessing.PolynomialFeatures
  * (preprocessing/data.py:1048-1158). Expands named numeric columns into
  * all monomials of total degree ≤ `degree` (products only when
  * `interactionOnly`). The reference fits sklearn on a 1-row sample to
  * learn the combination list, then maps blockwise; here the combination
  * list is enumerated on the driver and each output is a codegen'd
  * product expression — no fit pass over data is needed at all.
  *
  * Output naming: "x" → degree-1 passthrough, "x*y", "x^2", "x^2*y", …
  * (sklearn's get_feature_names with explicit column names).
  */
class PolynomialFeatures(
    val cols: Seq[String],
    val degree: Int = 2,
    val interactionOnly: Boolean = false,
    val includeBias: Boolean = false
) extends Estimator[PolynomialFeaturesModel] {
  require(degree >= 1, "degree must be >= 1")
  def fit(df: DataFrame): PolynomialFeaturesModel =
    new PolynomialFeaturesModel(cols, degree, interactionOnly, includeBias)
}

class PolynomialFeaturesModel(
    val cols: Seq[String],
    val degree: Int,
    val interactionOnly: Boolean,
    val includeBias: Boolean
) extends Model {

  /** Exponent vectors in sklearn order: by total degree, then
    * lexicographic in column order.
    */
  def combinations: Seq[Seq[Int]] = {
    def combos(d: Int): Seq[Seq[Int]] =
      if (d == 0) Seq(Seq.fill(cols.size)(0))
      else for {
        prev <- combos(d - 1)
        // next column index must be >= the last nonzero to avoid dups
        start = prev.lastIndexWhere(_ > 0) match { case -1 => 0; case i => i }
        j <- start until cols.size
        if !interactionOnly || prev(j) == 0
      } yield prev.updated(j, prev(j) + 1)
    val byDeg = (1 to degree).flatMap(d => combos(d).distinct)
    (if (includeBias) Seq(Seq.fill(cols.size)(0)) else Nil) ++ byDeg
  }

  def featureName(exps: Seq[Int]): String =
    if (exps.forall(_ == 0)) "bias"
    else exps.zipWithIndex.collect {
      case (e, i) if e == 1 => cols(i)
      case (e, i) if e > 1 => s"${cols(i)}^$e"
    }.mkString("*")

  def transform(df: DataFrame): DataFrame = {
    val outputs: Seq[Column] = combinations.map { exps =>
      val term: Column =
        if (exps.forall(_ == 0)) lit(1.0)
        else exps.zipWithIndex.collect { case (e, i) if e > 0 =>
          if (e == 1) col(cols(i)) else pow(col(cols(i)), e)
        }.reduce(_ * _)
      term.as(featureName(exps))
    }
    val keep = df.columns.filterNot(cols.contains).map(col).toIndexedSeq
    df.select(keep ++ outputs: _*)
  }
}
