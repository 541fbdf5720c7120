package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity / l-diversity audit (Sweeney, "k-anonymity: a model for
  * protecting privacy", 2002; Machanavajjhala et al., "l-diversity",
  * ICDE 2006) — the release-gate report a data pipeline runs before
  * shipping a table containing quasi-identifiers: every row must be
  * indistinguishable from at least k−1 others on the QI columns
  * (k-anonymity), and each QI equivalence class must contain at least
  * l distinct sensitive values (l-diversity — k-anonymity alone falls
  * to the homogeneity attack when a class is sensitive-uniform).
  *
  * Scale shape: ONE groupBy over the QI columns computing class size
  * and distinct-sensitive count (Spark plans count(DISTINCT) per group
  * as a two-phase partial/expand aggregate — still a single shuffle on
  * the QI key), then a 1-row rollup. Nulls in a QI column form their
  * own equivalence class (the conservative reading: nulls are
  * linkable). Nothing is ever collected.
  */
object Anonymity {

  /** @return one row: (n_rows, n_classes, k_min, n_violating_k,
    *   rows_at_risk, frac_at_risk, l_min, n_violating_l) — k_min the
    *   smallest class, rows_at_risk the rows in classes smaller than
    *   k, l_min the least-diverse class's distinct sensitive count.
    */
  def kAnonymityReport(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, k: Long, l: Long = 2): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1 && l >= 1, s"k and l must be >= 1, got k=$k l=$l")
    val classes = df.groupBy(qiCols.map(col): _*).agg(
      count(lit(1)).as("__n"),
      count_distinct(col(sensitiveCol)).as("__l"))
    classes.agg(
      sum("__n").as("n_rows"),
      count(lit(1)).as("n_classes"),
      min("__n").as("k_min"),
      sum(when(col("__n") < k, 1L).otherwise(0L)).as("n_violating_k"),
      sum(when(col("__n") < k, col("__n")).otherwise(0L))
        .as("rows_at_risk"),
      round(try_divide(
        sum(when(col("__n") < k, col("__n")).otherwise(0L)),
        sum("__n")), 6).as("frac_at_risk"),
      min("__l").as("l_min"),
      sum(when(col("__l") < l, 1L).otherwise(0L)).as("n_violating_l"))
  }
}
