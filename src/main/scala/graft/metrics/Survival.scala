package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation (Kaplan & Meier, "Nonparametric
  * estimation from incomplete observations", JASA 1958) — the
  * retention/churn curve read off any event log with right-censoring:
  * units still alive at the observation cutoff haven't "died", they've
  * just stopped being observed, and dropping OR counting them as dead
  * both bias the curve; KM handles them exactly:
  *
  *   S(t) = Π_{t_i ≤ t, d_i > 0} (1 − d_i / n_i)
  *
  * with d_i deaths at time t_i and n_i the units still AT RISK
  * (duration ≥ t_i, deaths and censored alike).
  *
  * Scale shape: one rollup of the corpus to per-duration counts
  * (≤ |distinct durations| rows — days, so hundreds), then every
  * window — the reverse cumulative risk set and the ordered survival
  * product — runs strictly over that tiny aggregate frame, never the
  * corpus. The survival product is an ORDERED fold (ascending time)
  * of per-step factors each rounded to 6, so an independent engine
  * replays S(t) exactly (DuckDB: product(f ORDER BY t) over the same
  * frame).
  */
object Survival {

  /** @param df one row per UNIT: duration (integral time units, e.g.
    *   days) + event flag (true = death/churn observed, false =
    *   right-censored at that duration).
    * @return one row per duration with observed deaths: (t, n_risk,
    *   n_events, n_censored_at, surv) — surv the KM estimate after t,
    *   rounded to 6.
    */
  def kaplanMeier(df: DataFrame, durationCol: String,
      eventCol: String): DataFrame = {
    val per = df.select(col(durationCol).cast("long").as("__t"),
        col(eventCol).cast("boolean").as("__e"))
      .groupBy("__t").agg(
        count(lit(1)).as("__m"),
        sum(when(col("__e"), 1L).otherwise(0L)).as("__d"))
    // risk set: units with duration >= t — a reverse cumulative sum
    // over the tiny per-duration frame
    val wRisk = Window.orderBy(col("__t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSurv = Window.orderBy(col("__t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per.withColumn("__n", sum("__m").over(wRisk))
      .withColumn("__f",
        round(lit(1.0) - col("__d").cast("double") / col("__n"), 6))
      // ordered product as a fold over the ascending prefix of factors
      // (multiplication order pinned; the frame is duration-sized)
      .withColumn("__surv",
        round(aggregate(collect_list(col("__f")).over(wSurv),
          lit(1.0), (acc, x) => acc * x), 6))
      .filter(col("__d") > 0)
      .select(col("__t").as("t"), col("__n").as("n_risk"),
        col("__d").as("n_events"),
        (col("__m") - col("__d")).as("n_censored_at"),
        col("__surv").as("surv"))
  }

  /** Per-unit duration + churn flag from a raw event log — the
    * standard retention framing: a unit's duration is last−first
    * activity in `unitMicros` granules (days for subscription-style
    * logs, hours for high-frequency ones); units whose last activity
    * is within `churnGapUnits` granules of the observation cutoff (the
    * corpus max timestamp) are CENSORED — they may still be active;
    * everyone else churned at their last event. One per-unit aggregate
    * + a broadcast 1-row cutoff.
    *
    * @return (unit, duration, churned)
    */
  def durations(events: DataFrame, unitCol: String, tsCol: String,
      churnGapUnits: Int,
      unitMicros: Long = 86400000000L): DataFrame = {
    require(churnGapUnits >= 0 && unitMicros > 0,
      s"bad gap/unit: $churnGapUnits / $unitMicros")
    val per = events.groupBy(col(unitCol).as("unit")).agg(
      min(unix_micros(col(tsCol))).as("__f"),
      max(unix_micros(col(tsCol))).as("__l"))
    val cut = per.agg(max("__l").as("__cut"))
    per.crossJoin(broadcast(cut))
      .select(col("unit"),
        floor((col("__l") - col("__f")) / lit(unitMicros.toDouble))
          .cast("long").as("duration"),
        (col("__l") < col("__cut") - lit(churnGapUnits * unitMicros))
          .as("churned"))
  }
}
