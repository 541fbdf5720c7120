package graft.metrics

import org.apache.spark.sql.Row

import graft.SparkSpec

/** IPW ATE: constant-propensity degeneracy (both estimators collapse
  * to the difference of group means), an independent driver-side
  * replay with heterogeneous propensities, and weight clipping.
  */
class IpwSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Double, Boolean, Double)],
      clip: Double = 0.01): Row =
    Experiment.ipwAte(rows.toDF("y", "t", "e"), "y", "t", "e", clip)
      .head()

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("constant e = 0.5: both estimators equal the mean difference") {
    val rows = Seq((10.0, true, 0.5), (14.0, true, 0.5),
      (7.0, false, 0.5), (9.0, false, 0.5), (8.0, false, 0.5))
    val r = run(rows)
    assert(r.getAs[Long]("n_treated") == 2L)
    assert(r.getAs[Long]("n_control") == 3L)
    assert(r.getAs[Double]("ate_hajek") ~== 12.0 - 8.0)
    // HT with e = 0.5: sum(y/0.5)/n per arm = 2*sum(y)/n
    assert(r.getAs[Double]("ate_ht") ~== r6(2 * 24.0 / 5 - 2 * 24.0 / 5))
  }

  test("independent replay with heterogeneous propensities") {
    val rows = Seq((10.0, true, 0.8), (20.0, true, 0.4),
      (5.0, false, 0.5), (6.0, false, 0.2))
    val (syt, swt) = (10.0 / 0.8 + 20.0 / 0.4, 1 / 0.8 + 1 / 0.4)
    val (syc, swc) = (5.0 / 0.5 + 6.0 / 0.8, 1 / 0.5 + 1 / 0.8)
    val r = run(rows)
    assert(r.getAs[Double]("ate_ht") ~== r6(syt / 4 - syc / 4))
    assert(r.getAs[Double]("ate_hajek") ~== r6(syt / swt - syc / swc))
    assert(r.getAs[Double]("mean_w_treated") ~== r6(swt / 2))
    assert(r.getAs[Double]("mean_w_control") ~== r6(swc / 2))
  }

  test("clipping bounds the extreme-propensity weights") {
    // e = 0.001 would give weight 1000; clip 0.05 caps it at 20
    val rows = Seq((1.0, true, 0.001), (1.0, false, 0.999))
    val r = run(rows, clip = 0.05)
    assert(r.getAs[Double]("mean_w_treated") ~== 20.0)
    assert(r.getAs[Double]("mean_w_control") ~== 20.0)
  }
}
