package graft.metrics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PolicyEvalSpec extends SparkSpec {
  import spark.implicits._

  // deterministic rewards per (seg, act): the reward model is exact
  // q(0,a)=1 q(0,b)=3 q(1,a)=5 q(1,b)=2 → greedy π: 0→b, 1→a
  // contexts: seg 0 logged 4 times, seg 1 logged 6 → V_true(π) = 4.2
  private def fixture(p: (Int, String) => Double) = Seq(
    (0, "a", 1.0), (0, "a", 1.0), (0, "a", 1.0), (0, "b", 3.0),
    (1, "a", 5.0), (1, "a", 5.0), (1, "b", 2.0), (1, "b", 2.0),
    (1, "b", 2.0), (1, "b", 2.0))
    .map { case (s, a, r) => (s, a, r, p(s, a)) }
    .toDF("seg", "act", "r", "p")

  // the true per-(seg, act) logging propensities of the fixture
  private val truth: (Int, String) => Double = {
    case (0, "a") => 0.75
    case (0, "b") => 0.25
    case (1, "a") => 2.0 / 6
    case (1, "b") => 4.0 / 6
    case _ => 0.0
  }

  test("greedy policy is the argmax with action-ascending tie-break") {
    val m = PolicyEval.rewardModelAndPolicy(
      fixture(truth), "seg", "act", "r")
    val pi = m.select("segment", "pi_action").distinct().collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(pi == Map(0 -> "b", 1 -> "a"))
    // equal q̂ → lexicographically smaller action wins
    val tied = Seq((0, "z", 2.0), (0, "y", 2.0)).toDF("seg", "act", "r")
    val piTied = PolicyEval.rewardModelAndPolicy(tied, "seg", "act", "r")
      .select("pi_action").head().getString(0)
    assert(piTied == "y")
  }

  test("exact model + exact propensities: IPS = DM = DR = true value") {
    val row = PolicyEval.evaluateGreedy(fixture(truth),
      "seg", "act", "r", "p").head()
    assert(row.getAs[Double]("v_dm") ~== 4.2)
    assert(row.getAs[Double]("v_ips") ~== 4.2)
    assert(row.getAs[Double]("v_snips") ~== 4.2)
    assert(row.getAs[Double]("v_dr") ~== 4.2)
    assert(row.getAs[Long]("n") == 10L)
    assert(row.getAs[Long]("n_match") == 3L) // 1×(0,b) + 2×(1,a)
  }

  test("double robustness: wrong propensities, right reward model") {
    // propensities all claimed 0.5 though logging was skewed: IPS is
    // biased, but DM and DR (exact model ⇒ zero residuals) stay true
    val row = PolicyEval.evaluateGreedy(fixture((_, _) => 0.5),
      "seg", "act", "r", "p").head()
    assert(row.getAs[Double]("v_dm") ~== 4.2)
    assert(row.getAs[Double]("v_dr") ~== 4.2)
    assert(math.abs(row.getAs[Double]("v_ips") - 4.2) > 0.3,
      s"IPS should be biased here: ${row.getAs[Double]("v_ips")}")
    // v_logged is the behavior policy's realized mean, not π's
    assert(row.getAs[Double]("v_logged") ~== (1.0 * 3 + 3 + 5 * 2 + 2 * 4) / 10)
  }

  test("independent replay of all four estimators on noisy rewards") {
    // rewards no longer a pure function of (seg, act) → the model is
    // imperfect and every estimator differs; replay them by hand
    val rows = Seq(
      (0, "a", 1.0, 0.5), (0, "a", 2.0, 0.5), (0, "b", 4.0, 0.5),
      (1, "b", 3.0, 0.5), (1, "a", 0.5, 0.5), (1, "b", 5.0, 0.5))
    val df = rows.toDF("seg", "act", "r", "p")
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val q = rows.groupBy(t => (t._1, t._2))
      .map { case (k, v) => k -> r6(v.map(_._3).sum / v.size) }
    val pi = q.keys.map(_._1).toSeq.distinct
      .map(s => s -> q.filter(_._1._1 == s).toSeq
        .maxBy { case ((_, a), qv) => (qv, -a.charAt(0).toInt) }._1._2)
      .toMap
    val n = rows.size.toDouble
    val w = rows.map(t => if (t._2 == pi(t._1)) 1.0 / t._4 else 0.0)
    val ips = rows.zip(w).map { case (t, wi) => t._3 * wi }.sum / n
    val snips = rows.zip(w).map { case (t, wi) => t._3 * wi }.sum / w.sum
    val dm = rows.map(t => q((t._1, pi(t._1)))).sum / n
    val dr = rows.zip(w).map { case (t, wi) =>
      q((t._1, pi(t._1))) + (t._3 - q((t._1, t._2))) * wi }.sum / n
    val row = PolicyEval.evaluateGreedy(df, "seg", "act", "r", "p").head()
    assert(row.getAs[Double]("v_ips") ~== (r6(ips), 1e-6))
    assert(row.getAs[Double]("v_snips") ~== (r6(snips), 1e-6))
    assert(row.getAs[Double]("v_dm") ~== (r6(dm), 1e-6))
    assert(row.getAs[Double]("v_dr") ~== (r6(dr), 1e-6))
  }
}
