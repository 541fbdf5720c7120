package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Uplift-by-decile table (Radcliffe 2007's decile diagnostics — the
  * targeting readout for incrementality: rank by model score, and per
  * score decile compare treated vs control conversion). Where the gains
  * chart asks "does the score find responders", this asks "does it find
  * PERSUADABLES" — the difference matters whenever treatment is costly.
  *
  * Scale shape: identical to Gains — one 1-row exact-boundary
  * aggregate, scan-fused fold binning against the broadcast boundaries
  * (never a corpus ntile), then ONE ≤nBins-key grouped aggregate
  * carrying the four treated/control cells per decile. Counts stay
  * integral; rates and uplift are fixed-order arithmetic rounded 6.
  */
object Uplift {

  /** @return per decile 1..nBins (1 = highest scores): (decile, n_t,
    *   conv_t, n_c, conv_c, rate_t, rate_c, uplift) — rates null on
    *   empty cells (try_divide), uplift null if either side is. */
  def upliftByDecile(df: DataFrame, scoreCol: String, treated: Column,
      outcome: Column, nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val base = df.select(col(scoreCol).cast("double").as("__s"),
      treated.cast("boolean").as("__t"), outcome.cast("boolean").as("__y"))
    val ps = (1 until nBins).map(_.toDouble / nBins)
    val bounds = base.agg(
      expr(s"transform(percentile(__s, array(${ps.mkString(",")})), " +
        "b -> round(b, 6))").as("__bs"))
    base.crossJoin(broadcast(bounds))
      .select(col("__t"), col("__y"),
        (lit(1) + aggregate(col("__bs"), lit(0),
          (acc, b) => acc + when(col("__s") < b, 1).otherwise(0)))
          .as("decile"))
      .groupBy("decile").agg(
        sum(when(col("__t"), 1L).otherwise(0L)).as("n_t"),
        sum(when(col("__t") && col("__y"), 1L).otherwise(0L)).as("conv_t"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("n_c"),
        sum(when(!col("__t") && col("__y"), 1L).otherwise(0L)).as("conv_c"))
      .select(col("decile"), col("n_t"), col("conv_t"), col("n_c"),
        col("conv_c"),
        round(try_divide(col("conv_t"), col("n_t")), 6).as("rate_t"),
        round(try_divide(col("conv_c"), col("n_c")), 6).as("rate_c"),
        round(try_divide(col("conv_t"), col("n_t"))
          - try_divide(col("conv_c"), col("n_c")), 6).as("uplift"))
  }
}
