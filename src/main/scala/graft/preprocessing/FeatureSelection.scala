package graft.preprocessing

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Filter-method feature selection (the sklearn `SelectKBest` family —
  * `feature_selection/_univariate_selection.py` semantics re-expressed
  * for discrete/discretized features): per-feature mutual information
  * and the chi-square statistic of the (feature-bin × class) contingency
  * table, computed for EVERY candidate feature in ONE corpus pass.
  *
  * The caller supplies each feature's discretization as a Column (the
  * honest contract — binning policy is a modeling decision); the scan
  * explodes each row to (feature, bin, label) triples — a ×|features|
  * map-side fan-out of three narrow columns — and everything downstream
  * is arithmetic over the ≤ Σ|bins|·|classes| contingency frame. No
  * per-feature corpus passes, no windows, no collect.
  */
object FeatureSelection {

  /** Per-feature association scores against a label.
    * @param features (name, binned value) pairs; bins are cast to string
    *   so heterogeneous features coexist in one frame.
    * @return one row per feature: (feature, n_bins, n_classes, mi, chi2,
    *   dof) — mi in nats on the empirical joint, chi2 the independence
    *   statistic Σ (o−e)²/e with e = rowTotal·colTotal/N.
    */
  def scores(df: DataFrame, features: Seq[(String, Column)],
      label: Column): DataFrame = {
    require(features.nonEmpty, "scores needs at least one feature")
    val cells = df.select(
        posexplode(array(features.map(_._2.cast("string")): _*))
          .as(Seq("__f", "bin")),
        label.cast("string").as("label"))
      .groupBy("__f", "bin", "label").agg(count(lit(1)).as("n_xy"))
    val names = features.map(_._1)
    val withName = cells.withColumn("feature",
      element_at(array(names.map(lit): _*), col("__f") + 1))
    // margins off the contingency frame (tiny): per-feature bin totals,
    // class totals, and grand total
    val rowM = withName.groupBy("feature", "bin")
      .agg(sum("n_xy").as("n_x"))
    val colM = withName.groupBy("feature", "label")
      .agg(sum("n_xy").as("n_y"))
    val tot = withName.groupBy("feature").agg(sum("n_xy").as("n"))
    withName
      .join(rowM, Seq("feature", "bin"))
      .join(colM, Seq("feature", "label"))
      .join(tot, Seq("feature"))
      .groupBy(col("feature"))
      .agg(
        countDistinct(col("bin")).as("n_bins"),
        countDistinct(col("label")).as("n_classes"),
        // counts multiply as DOUBLE, not BIGINT: long×long wraps
        // silently in non-ANSI mode once n_xy·n exceeds 2^63 (~3e9
        // rows squared — certain at the 100 TB regime); double keeps
        // exactness below 2^53 and degrades gracefully above
        round(sum((col("n_xy") / col("n"))
          * log(col("n_xy").cast("double") * col("n")
            / (col("n_x").cast("double") * col("n_y")))), 6)
          .as("mi"),
        round(sum(pow(col("n_xy")
            - col("n_x").cast("double") * col("n_y") / col("n"), 2)
          / (col("n_x").cast("double") * col("n_y") / col("n")))
          // absent cells (n_xy = 0) still contribute e to chi2:
          // Σ_present (o−e)²/e + Σ_absent e = Σ_present ((o−e)²/e − e) + N
          - sum(col("n_x").cast("double") * col("n_y") / col("n"))
          + first(col("n")), 6).as("chi2"),
        ((countDistinct(col("bin")) - 1)
          * (countDistinct(col("label")) - 1)).as("dof"))
  }

  /** Top-k features by mutual information (name tiebreak) — the
    * SelectKBest surface. The score frame is ≤ |features| rows, so the
    * ordered prefix is driver-bounded by construction. */
  def selectKBest(scoreFrame: DataFrame, k: Int): DataFrame =
    scoreFrame.orderBy(col("mi").desc, col("feature")).limit(k)
}
