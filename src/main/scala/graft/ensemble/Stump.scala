package graft.ensemble

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Histogram-based decision-stump split finding — the per-feature best
  * threshold by Gini impurity decrease, computed the way large-scale
  * tree learners do it (the XGBoost/LightGBM approximate split
  * algorithm, Chen & Guestrin KDD'16 §3.2): the corpus collapses to a
  * per-(feature, bin) histogram in ONE exploded pass, and every
  * candidate threshold is evaluated from prefix sums over that tiny
  * frame. No sort of the corpus, no per-candidate passes.
  *
  * Candidate thresholds are the bin boundaries ("split at bin t" =
  * left side is bins ≤ t); bins are caller-supplied integer Columns
  * (the FeatureSelection discretization contract). Counts stay
  * integral, the Gini arithmetic is a fixed-order expression over
  * longs, and the decrease is rounded to 6 BEFORE the per-feature
  * argmax (ties → smallest threshold), so the chosen split is
  * engine-reproducible.
  */
object Stump {

  /** Per-feature best binary split for a boolean label:
    * (feature, threshold, n_left, n_right, parent_gini, gini_decrease).
    */
  def bestSplits(df: DataFrame, features: Seq[(String, Column)],
      label: Column): DataFrame = {
    require(features.nonEmpty, "bestSplits needs at least one feature")
    val names = features.map(_._1)
    val hist = df.select(
        posexplode(array(features.map(_._2.cast("int")): _*))
          .as(Seq("__f", "bin")),
        label.cast("boolean").cast("long").as("__y"))
      .groupBy("__f", "bin")
      .agg(count(lit(1)).as("n"), sum("__y").as("pos"))
      .withColumn("feature",
        element_at(array(names.map(lit): _*), col("__f") + 1))
    val tot = hist.groupBy("feature")
      .agg(sum("n").as("nt"), sum("pos").as("pt"))
    // left-side cumulative mass per candidate threshold (self-join over
    // the ≤Σ|bins| histogram frame — not a window, not the corpus)
    val left = hist.alias("a")
      .join(hist.alias("b"),
        col("a.feature") === col("b.feature")
          && col("b.bin") <= col("a.bin"))
      .groupBy(col("a.feature").as("feature"), col("a.bin").as("threshold"))
      .agg(sum(col("b.n")).as("nl"), sum(col("b.pos")).as("pl"))
    // null-guarded denominator: under ANSI mode the optimizer may
    // evaluate this projection on rows the nl < nt filter later drops
    // (e.g. the max-bin threshold, where the right side is empty) —
    // those rows must yield null, not a DIVIDE_BY_ZERO
    def gini(p: Column, n: Column): Column = {
      val nn = when(n =!= 0L, n)
      lit(1.0) - pow(p / nn, 2) - pow((n - p) / nn, 2)
    }
    val scored = left.join(tot, Seq("feature"))
      .where(col("nl") < col("nt")) // right side must be non-empty
      .select(col("feature"), col("threshold"),
        col("nl"), (col("nt") - col("nl")).as("nr"),
        round(gini(col("pt"), col("nt")), 6).as("parent_gini"),
        round(gini(col("pt"), col("nt"))
          - ((col("nl") / col("nt")) * gini(col("pl"), col("nl"))
            + ((col("nt") - col("nl")) / col("nt"))
              * gini(col("pt") - col("pl"), col("nt") - col("nl"))), 6)
          .as("gini_decrease"))
    // argmax per feature on the ROUNDED decrease, smallest threshold
    // breaking ties — a ≤|features|-row equality join, no window
    val best = scored.groupBy("feature")
      .agg(max("gini_decrease").as("gini_decrease"))
    scored.join(best, Seq("feature", "gini_decrease"))
      .groupBy("feature", "gini_decrease")
      .agg(min("threshold").as("threshold"))
      .join(scored, Seq("feature", "gini_decrease", "threshold"))
      .select(col("feature"), col("threshold"), col("nl").as("n_left"),
        col("nr").as("n_right"), col("parent_gini"), col("gini_decrease"))
  }
}
