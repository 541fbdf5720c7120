package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Offline (counterfactual) policy evaluation on logged interaction
  * data — "what would THIS policy have earned on the traffic we
  * already logged?", the question every recommender / ranking change
  * answers before an online A/B:
  *
  *  - IPS (inverse propensity scoring; Horvitz–Thompson form used for
  *    bandit replay by Li, Chu, Langford & Wang, WSDM 2011):
  *    V̂ = (1/n) Σ r·𝟙[π(x)=a]/p(a|x) — unbiased, high variance.
  *  - SNIPS (self-normalized IPS; Swaminathan & Joachims, NeurIPS
  *    2015): Σ r·w / Σ w — trades a vanishing bias for bounded
  *    variance; the production default.
  *  - DM (direct method): V̂ = (1/n) Σ q̂(x, π(x)) over a fitted
  *    reward model — biased when q̂ is, zero variance from matching.
  *  - DR (doubly robust; Dudík, Langford & Li, ICML 2011):
  *    DM + the IPS-weighted RESIDUAL correction — consistent if
  *    EITHER q̂ OR the logged propensities are right.
  *
  * Scale shape: the reward model and the target policy are ONE
  * (segment, action) aggregate (tiny, broadcast back); the four
  * estimators are ONE corpus aggregate over the logged rows joined to
  * those broadcast frames. Nothing driver-side; every reported value
  * rounds at the output boundary.
  *
  * Exactness: q̂ is quantized round-6 at construction and the policy
  * argmax runs over the QUANTIZED values with action-ascending
  * tie-break — so the chosen action, and hence every estimator, is
  * engine-independent.
  */
object PolicyEval {

  /** Reward model + greedy target policy from the logged frame: one
    * (segment, action) mean-reward aggregate (q̂ rounded 6), and per
    * segment the argmax action under (q̂ desc, action asc) as ONE
    * min-struct aggregate over the tiny model frame.
    * @return (segment, action, q, pi_action)
    */
  def rewardModelAndPolicy(logged: DataFrame, segCol: String,
      actionCol: String, rewardCol: String): DataFrame = {
    val q = logged.groupBy(col(segCol).as("segment"),
        col(actionCol).as("action"))
      .agg(round(avg(col(rewardCol).cast("double")), 6).as("q"))
    val pi = q.groupBy("segment")
      .agg(min(struct((-col("q")).as("nq"), col("action").as("a")))
        .as("__m"))
      .select(col("segment"), col("__m.a").as("pi_action"))
    q.join(pi, "segment")
  }

  /** The four estimators in ONE corpus aggregate. `propensityCol` is
    * the logged p(a|x) (caller-scored — the [[Experiment.ipwAte]]
    * contract), clipped into [clip, 1].
    * @param model the [[rewardModelAndPolicy]] frame (broadcast-sized).
    * @return one row: n, n_match, match_rate, v_logged, v_ips,
    *   v_snips, v_dm, v_dr.
    */
  def evaluate(logged: DataFrame, model: DataFrame, segCol: String,
      actionCol: String, rewardCol: String, propensityCol: String,
      clip: Double = 0.01): DataFrame = {
    require(clip > 0 && clip <= 1, s"need 0 < clip <= 1, got $clip")
    val p = least(greatest(col(propensityCol).cast("double"), lit(clip)),
      lit(1.0))
    val base = logged.select(col(segCol).as("segment"),
      col(actionCol).as("action"),
      col(rewardCol).cast("double").as("__r"), p.as("__p"))
    // q̂ of the LOGGED action, q̂ of the POLICY action, and the policy
    // action itself — two broadcast joins against the tiny model frame
    val qLogged = model.select(col("segment"), col("action"),
      col("q").as("__q_a"))
    val qPolicy = model
      .filter(col("action") === col("pi_action"))
      .select(col("segment"), col("q").as("__q_pi"),
        col("pi_action").as("__pi"))
    val joined = base
      .join(broadcast(qLogged), Seq("segment", "action"))
      .join(broadcast(qPolicy), Seq("segment"))
      .select(col("__r"), col("__p"), col("__q_a"), col("__q_pi"),
        (col("action") === col("__pi")).as("__match"))
    val w = when(col("__match"), lit(1.0) / col("__p")).otherwise(lit(0.0))
    val m = joined.agg(
      count(lit(1)).as("__n"),
      sum(when(col("__match"), 1L).otherwise(0L)).as("__nm"),
      sum(col("__r")).as("__sr"),
      sum(col("__r") * w).as("__srw"),
      sum(w).as("__sw"),
      sum(col("__q_pi")).as("__sqpi"),
      sum(col("__q_pi") + (col("__r") - col("__q_a")) * w).as("__sdr"))
    m.select(
      col("__n").as("n"),
      col("__nm").as("n_match"),
      round(col("__nm").cast("double") / col("__n"), 6).as("match_rate"),
      round(col("__sr") / col("__n"), 6).as("v_logged"),
      round(col("__srw") / col("__n"), 6).as("v_ips"),
      round(try_divide(col("__srw"), col("__sw")), 6).as("v_snips"),
      round(col("__sqpi") / col("__n"), 6).as("v_dm"),
      round(col("__sdr") / col("__n"), 6).as("v_dr"))
  }

  /** Convenience composition: model+policy then the estimator pass. */
  def evaluateGreedy(logged: DataFrame, segCol: String, actionCol: String,
      rewardCol: String, propensityCol: String,
      clip: Double = 0.01): DataFrame =
    evaluate(logged,
      rewardModelAndPolicy(logged, segCol, actionCol, rewardCol),
      segCol, actionCol, rewardCol, propensityCol, clip)
}
