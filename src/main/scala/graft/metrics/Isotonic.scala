package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed isotonic regression for probability calibration (the
  * sklearn `IsotonicRegression` / `CalibratedClassifierCV(method=
  * 'isotonic')` semantics, Zadrozny & Elkan KDD'02) — fit a monotone
  * non-decreasing step function from a score to P(label).
  *
  * Scale shape: the corpus contributes exactly TWO aggregate passes
  * (score range, then per-bucket (positives, count) over B fixed-width
  * buckets); the pool-adjacent-violators solution is evaluated on the
  * ≤B-row bucket frame via the minimax identity
  *
  *     fit(i) = max_{a ≤ i} min_{b ≥ i} mean(y[a..b])
  *
  * (Robertson/Wright/Dykstra 1988 §1.2 — the PAV fixpoint in closed
  * form), with interval means taken from prefix sums. Everything after
  * the bucket rollup is integer arithmetic + fixed-order double
  * division over ≤B³ tiny rows — no windows, no collect, and bit-exact
  * replay in any engine. Binary labels keep the bucket sums integral,
  * so no float accumulation order exists anywhere.
  */
object Isotonic {

  /** Per-bucket isotonic fit: (bucket, n, pos, raw_rate, fitted) with
    * `fitted` monotone non-decreasing in bucket. `label` must be
    * boolean-castable; scores land in B fixed-width buckets over the
    * observed [min, max] (top edge clamped into the last bucket). */
  def fitBuckets(df: DataFrame, score: Column, label: Column,
      nBuckets: Int = 20): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 1000, s"nBuckets: $nBuckets")
    val base = df.select(score.cast("double").as("__s"),
      label.cast("boolean").cast("long").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
    val range = base.agg(min("__s").as("__lo"), max("__s").as("__hi"))
    val bucketed = base.join(broadcast(range))
      .select(least(lit(nBuckets - 1), when(col("__hi") === col("__lo"), lit(0))
        .otherwise(floor((col("__s") - col("__lo"))
          / (col("__hi") - col("__lo")) * nBuckets)))
        .cast("int").as("bucket"), col("__y"))
    val g = bucketed.groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("__y").as("pos"))
    // prefix sums over the ≤B bucket frame (self-join, not a window;
    // the non-equi joins broadcast one tiny side explicitly — a
    // BroadcastNestedLoopJoin over ≤B rows, never a CartesianProduct)
    val p = g.alias("a")
      .join(broadcast(g.alias("b")), col("b.bucket") <= col("a.bucket"))
      .groupBy(col("a.bucket").as("bucket"))
      .agg(sum(col("b.n")).as("cn"), sum(col("b.pos")).as("cp"))
    // interval means for every a ≤ b pair, from prefix differences
    // prefix(x) is inclusive of x, so the a..b interval subtracts
    // prefix(a) and adds bucket a's own mass back
    val pairs = p.alias("pa").join(broadcast(p.alias("pb")),
        col("pa.bucket") <= col("pb.bucket"))
      .select(col("pa.bucket").as("a"), col("pb.bucket").as("b"),
        col("pa.cp").as("cpa"), col("pa.cn").as("cna"),
        col("pb.cp").as("cpb"), col("pb.cn").as("cnb"))
      .join(g.select(col("bucket").as("a"), col("n").as("na"),
        col("pos").as("pa_own")), Seq("a"))
      .select(col("a"), col("b"),
        ((col("cpb") - col("cpa") + col("pa_own"))
          / (col("cnb") - col("cna") + col("na"))).as("avg_ab"))
    // fit(i) = max over a<=i of ( min over b>=i of avg(a,b) )
    val buckets = g.select(col("bucket").as("i"))
    val inner = pairs.join(broadcast(buckets),
        col("a") <= col("i") && col("i") <= col("b"))
      .groupBy("i", "a").agg(min("avg_ab").as("m"))
      .groupBy("i").agg(max("m").as("__fit"))
    g.join(inner, g("bucket") === inner("i"))
      .select(col("bucket"), col("n"), col("pos"),
        round(col("pos") / col("n"), 6).as("raw_rate"),
        round(col("__fit"), 6).as("fitted"))
  }
}
