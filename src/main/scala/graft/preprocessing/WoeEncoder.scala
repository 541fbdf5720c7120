package graft.preprocessing

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weight-of-Evidence encoding + Information Value (the credit-scoring
  * standard; Siddiqi, "Credit Risk Scorecards", 2006) — the
  * interpretable categorical encoder for binary targets:
  *
  *   woe(c) = ln( P(x=c | y=1) / P(x=c | y=0) )
  *   IV     = Σ_c (P(x=c|y=1) − P(x=c|y=0)) · woe(c)
  *
  * with Laplace smoothing (+0.5 per cell) so single-class categories
  * stay finite. IV is the scorecard feature-screening number (< 0.02
  * useless, > 0.5 suspicious).
  *
  * Scale shape: fit is ONE groupBy(category) with conditional counts +
  * a broadcast 1-row total; transform is a broadcast hash join of the
  * ≤|categories| mapping onto the corpus (the TargetEncoder shape).
  * Counts stay integer until the single ln per category; woe/iv are
  * quantized so an independent engine replays them exactly.
  */
object WoeEncoder {

  /** Per-category WoE table: (category, n_pos, n_neg, woe, iv_term),
    * plus the scalar IV as the sum of iv_term.
    */
  def fit(df: DataFrame, catCol: String, label: Column): DataFrame = {
    val per = df.groupBy(col(catCol).cast("string").as("category")).agg(
      sum(when(label.cast("boolean"), 1L).otherwise(0L))
        .as("n_pos"),
      sum(when(label.cast("boolean"), 0L).otherwise(1L))
        .as("n_neg"))
    val tot = per.agg(sum("n_pos").as("__tp"), sum("n_neg").as("__tn"),
      count(lit(1)).as("__k"))
    // smoothed class-conditional shares: (n_c + 0.5) / (N + 0.5k)
    val dp = (col("n_pos") + lit(0.5)) / (col("__tp") + lit(0.5) * col("__k"))
    val dn = (col("n_neg") + lit(0.5)) / (col("__tn") + lit(0.5) * col("__k"))
    per.crossJoin(broadcast(tot))
      .select(col("category"), col("n_pos"), col("n_neg"),
        round(log(dp / dn), 6).as("woe"),
        round((dp - dn) * round(log(dp / dn), 6), 6).as("iv_term"))
  }

  /** Replace the category with its fitted WoE (broadcast mapping);
    * unseen categories get 0 (the no-evidence prior).
    */
  def transform(df: DataFrame, mapping: DataFrame, catCol: String,
      outCol: String): DataFrame =
    df.join(broadcast(mapping.select(col("category"), col("woe"))),
        df(catCol).cast("string") === col("category"), "left")
      .drop("category")
      .withColumn(outCol, coalesce(col("woe"), lit(0.0)))
      .drop("woe")
}
