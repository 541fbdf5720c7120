package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group fairness slice report (Hardt, Price & Srebro, "Equality
  * of Opportunity in Supervised Learning", NeurIPS 2016; the "model
  * card" slice table) — the audit a pipeline runs before shipping a
  * classifier: the same confusion-matrix rates, computed PER protected
  * group, so demographic-parity gaps (selection-rate ratios) and
  * equalized-odds gaps (TPR/FPR differences) are read directly off
  * adjacent rows.
  *
  * Scale shape: ONE grouped aggregate over the corpus — every rate is
  * a conditional count inside the same groupBy (the Constraints-suite
  * discipline); the output is |groups| rows. try_divide keeps empty
  * cells null (a group with no positives has no TPR) instead of
  * fabricating rates.
  */
object Fairness {

  /** @return one row per group: (group, n, base_rate, selection_rate,
    *   accuracy, tpr, fpr, precision) — all rounded 6, null where the
    *   denominator is empty.
    */
  def sliceReport(df: DataFrame, groupCol: String, labelCol: Column,
      predCol: Column): DataFrame = {
    val y = labelCol.cast("boolean")
    val p = predCol.cast("boolean")
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    df.groupBy(col(groupCol).cast("string").as("group")).agg(
        count(lit(1)).as("n"),
        cnt(y).as("__pos"), cnt(p).as("__sel"),
        cnt(y === p).as("__ok"),
        cnt(y && p).as("__tp"), cnt(!y && p).as("__fp"),
        cnt(!y).as("__neg"))
      .select(col("group"), col("n"),
        round(try_divide(col("__pos"), col("n")), 6).as("base_rate"),
        round(try_divide(col("__sel"), col("n")), 6).as("selection_rate"),
        round(try_divide(col("__ok"), col("n")), 6).as("accuracy"),
        round(try_divide(col("__tp"), col("__pos")), 6).as("tpr"),
        round(try_divide(col("__fp"), col("__neg")), 6).as("fpr"),
        round(try_divide(col("__tp"), col("__sel")), 6).as("precision"))
  }

  /** The two headline gaps off the slice table (tiny frame): the
    * worst-over-best selection-rate ratio (disparate impact / the
    * four-fifths rule) and the max pairwise TPR and FPR differences
    * (equalized odds). One aggregate over ≤|groups| rows.
    */
  def disparity(slices: DataFrame): DataFrame =
    slices.agg(
      round(try_divide(min("selection_rate"), max("selection_rate")), 6)
        .as("disparate_impact"),
      round(max("tpr") - min("tpr"), 6).as("tpr_gap"),
      round(max("fpr") - min("fpr"), 6).as("fpr_gap"))
}
