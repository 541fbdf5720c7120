package graft.metrics

import org.apache.spark.sql.Row

import graft.SparkSpec

/** AIPW doubly-robust ATE: exact recovery in a linear world, double
  * robustness under a WRONG propensity (the outcome model rescues it
  * where plain IPW is biased), component accounting, and the per-arm
  * OLS fit itself.
  */
class AipwSpec extends SparkSpec {
  import spark.implicits._

  // (y, t, e, x)
  private def run(rows: Seq[(Double, Boolean, Double, Double)],
      clip: Double = 0.01): Row =
    Experiment.aipwAte(rows.toDF("y", "t", "e", "x"), "y", "t", "e", "x",
      clip).head()

  /** Linear world: y = 2 + 3x + 5t exactly (no noise). */
  private def linear(xs: Seq[Double], treat: Double => Boolean,
      e: Double => Double): Seq[(Double, Boolean, Double, Double)] =
    xs.map { x =>
      val t = treat(x)
      (2.0 + 3.0 * x + (if (t) 5.0 else 0.0), t, e(x), x)
    }

  test("exact linear outcome: τ̂ = 5 and residual corrections vanish") {
    // confounded assignment (treated iff x >= 4) with an arbitrary
    // propensity column: the outcome model fits each arm EXACTLY, so
    // every residual is 0 and τ̂ is exact no matter what e says
    val rows = linear(Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0),
      treat = _ >= 4, e = x => 0.2 + 0.05 * x)
    val r = run(rows)
    assert(r.getAs[Double]("mu1_slope") ~== 3.0)
    assert(r.getAs[Double]("mu0_slope") ~== 3.0)
    assert(r.getAs[Double]("mu1_intercept") ~== 7.0)
    assert(r.getAs[Double]("mu0_intercept") ~== 2.0)
    assert(r.getAs[Double]("resid_corr_treated") ~== 0.0)
    assert(r.getAs[Double]("resid_corr_control") ~== 0.0)
    assert(r.getAs[Double]("ate_outcome_model") ~== 5.0)
    assert(r.getAs[Double]("ate_aipw") ~== 5.0)
  }

  test("double robustness: wrong propensity, right outcome model") {
    // plain IPW with this (badly wrong) constant e would be biased on
    // the confounded design; AIPW still lands exactly on 5
    val rows = linear((1 to 12).map(_.toDouble),
      treat = x => x > 6, e = _ => 0.5)
    val r = run(rows)
    assert(r.getAs[Double]("ate_aipw") ~== 5.0)
    // and the IPW estimator on the same frame is NOT 5 (the bias AIPW
    // removes): HT = Σt·y/e/n − Σ(1−t)y/(1−e)/n with e=0.5
    val ipw = Experiment.ipwAte(rows.toDF("y", "t", "e", "x"),
      "y", "t", "e").head().getAs[Double]("ate_ht")
    assert(math.abs(ipw - 5.0) > 1.0, s"IPW should be biased here: $ipw")
  }

  test("component accounting: τ̂ = outcome gap + treated − control corr") {
    // noisy world (outcome model imperfect): the identity still holds
    // by construction, and all three components are finite
    val rows = Seq(
      (10.0, true, 0.7, 1.0), (15.0, true, 0.8, 2.0),
      (22.0, true, 0.6, 3.0), (4.0, false, 0.3, 1.0),
      (7.0, false, 0.4, 2.0), (8.0, false, 0.2, 3.0),
      (13.0, false, 0.5, 4.0))
    val r = run(rows)
    val assembled = BigDecimal(r.getAs[Double]("ate_outcome_model")
      + r.getAs[Double]("resid_corr_treated")
      - r.getAs[Double]("resid_corr_control"))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("ate_aipw") ~== assembled)
    assert(r.getAs[Long]("n_treated") == 3L)
    assert(r.getAs[Long]("n_control") == 4L)
  }

  test("clipping bounds the correction weights") {
    // an extreme propensity on one treated row: with clip = 0.05 the
    // residual weight is 1/0.05 = 20, not 10000. Three non-collinear
    // points per arm so the OLS leaves real residuals to weight (a
    // 2-point arm fits exactly and the correction vanishes either way)
    val rows = Seq(
      (30.0, true, 0.001, 1.0), (12.0, true, 0.5, 2.0),
      (11.0, true, 0.5, 3.0),
      (1.0, false, 0.5, 1.0), (2.0, false, 0.5, 2.0),
      (5.0, false, 0.5, 3.0))
    val rClipped = run(rows, clip = 0.05)
    val rWild = run(rows, clip = 0.0001)
    assert(math.abs(rClipped.getAs[Double]("resid_corr_treated"))
      < math.abs(rWild.getAs[Double]("resid_corr_treated")),
      "clipping must shrink the extreme-weight correction")
  }
}
