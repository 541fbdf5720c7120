package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch conversion attribution over an event log — the
  * marketing-analytics readout (last-touch / first-touch / linear,
  * the standard position-based model family): every conversion event
  * distributes credit over the touch events that preceded it (since
  * the user's previous conversion).
  *
  * Scale shape: ONE per-user ordered window assigns each event its
  * conversion group (cumulative conversion count — the operator's
  * semantics, partitioned by user, never a global sort; the q_scd2 /
  * q_event_transitions whitelist family), then per-(user, group)
  * aggregates pick first/last touches as min/max structs and count
  * touches — no second window, no collect. Channel rollups are
  * ≤|channels| rows. Linear credit is Σ 1/n over groups, rounded 6.
  */
object Attribution {

  /** @param conversion boolean column marking conversion events
    * @return per channel (touch event_type): (channel, first_touch,
    *   last_touch, linear_credit, n_touches) over attributed groups. */
  def multiTouch(df: DataFrame, userCol: String, tsCol: String,
      channelCol: String, tiebreakCol: String,
      conversion: Column): DataFrame = {
    val w = Window.partitionBy(col("u")).orderBy(col("ts"), col("tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tagged = df.select(col(userCol).as("u"), col(tsCol).as("ts"),
        col(tiebreakCol).as("tb"), col(channelCol).as("channel"),
        conversion.cast("boolean").as("conv"))
      .withColumn("grp", sum(when(col("conv"), 1L).otherwise(0L)).over(w))
    // a touch with cumulative count g belongs to conversion g+1; only
    // groups that actually END in a conversion attribute (touches after
    // the user's last conversion stay unattributed)
    val touches = tagged.where(!col("conv"))
      .select(col("u"), (col("grp") + 1).as("grp"), col("ts"), col("tb"),
        col("channel"))
    val convs = tagged.where(col("conv"))
      .select(col("u"), col("grp"))
    val attributed = touches.join(convs, Seq("u", "grp"))
    val perGroup = attributed.groupBy("u", "grp").agg(
      min(struct(col("ts"), col("tb"), col("channel"))).as("__first"),
      max(struct(col("ts"), col("tb"), col("channel"))).as("__last"),
      count(lit(1)).as("__n"))
    val firsts = perGroup.groupBy(col("__first.channel").as("channel"))
      .agg(count(lit(1)).as("first_touch"))
    val lasts = perGroup.groupBy(col("__last.channel").as("channel"))
      .agg(count(lit(1)).as("last_touch"))
    val linear = attributed
      .join(perGroup.select(col("u"), col("grp"), col("__n")), Seq("u", "grp"))
      .groupBy("channel")
      .agg(round(sum(lit(1.0) / col("__n")), 6).as("linear_credit"),
        count(lit(1)).as("n_touches"))
    linear.join(firsts, Seq("channel"), "left")
      .join(lasts, Seq("channel"), "left")
      .select(col("channel"),
        coalesce(col("first_touch"), lit(0L)).as("first_touch"),
        coalesce(col("last_touch"), lit(0L)).as("last_touch"),
        col("linear_credit"), col("n_touches"))
  }
}
