package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cumulative gains / lift chart — the model-targeting readout next to
  * ROC: rank the population by model score, cut into score deciles
  * (decile 1 = highest scores), and report what fraction of all
  * positives the top-k deciles capture (gain) and how much better than
  * random each prefix is (lift). The campaign-targeting and
  * triage-queue sizing chart.
  *
  * Scale shape: ONE 1-row aggregate for the exact decile boundaries
  * (the documented percentile_approx switch at volume), a scan-fused
  * fold against the broadcast boundary array to bin every row (no
  * global sort, no corpus window — the naive ntile-over-everything is
  * exactly the 100 TB anti-pattern), one ≤nBins-key aggregate, and
  * cumulative windows strictly over that tiny frame. Boundaries are
  * rounded to 6 at the handoff so both engines bin identically; a
  * score exactly AT a boundary goes to the better (lower-numbered)
  * decile in both.
  */
object Gains {

  /** @return one row per decile 1..nBins: (decile, n, pos, cum_gain,
    *   lift) — cum_gain the positive mass captured by deciles ≤ this,
    *   lift the prefix precision over the base rate, both rounded 6.
    */
  def gainsChart(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val base = df.select(col(scoreCol).cast("double").as("__s"),
      col(labelCol).cast("boolean").as("__y"))
    val ps = (1 until nBins).map(_.toDouble / nBins)
    val bounds = base.agg(
      expr(s"transform(percentile(__s, array(${ps.mkString(",")})), " +
        "b -> round(b, 6))").as("__bs"))
    val binned = base.crossJoin(broadcast(bounds))
      .select(col("__y"),
        (lit(1) + aggregate(col("__bs"), lit(0),
          (acc, b) => acc + when(col("__s") < b, 1).otherwise(0)))
          .as("decile"))
    val per = binned.groupBy("decile").agg(
      count(lit(1)).as("n"),
      sum(when(col("__y"), 1L).otherwise(0L)).as("pos"))
    // cumulative + totals over the ≤nBins-row frame only
    val wCum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    per.withColumn("__cn", sum("n").over(wCum))
      .withColumn("__cp", sum("pos").over(wCum))
      .withColumn("__tn", sum("n").over(wAll))
      .withColumn("__tp", sum("pos").over(wAll))
      .select(col("decile"), col("n"), col("pos"),
        round(try_divide(col("__cp"), col("__tp")), 6).as("cum_gain"),
        round(try_divide(
          try_divide(col("__cp"), col("__cn")),
          try_divide(col("__tp"), col("__tn"))), 6).as("lift"))
  }
}
