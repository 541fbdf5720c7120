package graft.metrics

import graft.SparkSpec

class RatioDeltaSpec extends SparkSpec {
  import spark.implicits._

  // (variant, y, n) per unit
  private def run(rows: Seq[(Long, Double, Double)]) =
    Experiment.ratioMetricDelta(rows.toDF("variant", "y", "n"),
      "variant", "y", "n").head()

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("ratios are ratios of TOTALS and the replay matches by hand") {
    val a = Seq((0L, 10.0, 5.0), (0L, 2.0, 1.0), (0L, 6.0, 4.0))
    val b = Seq((1L, 8.0, 2.0), (1L, 4.0, 4.0), (1L, 9.0, 3.0))
    val row = run(a ++ b)
    // Σy/Σn per arm — NOT the mean of per-unit ratios
    assert(row.getAs[Double]("ratio_a") ~== r6(18.0 / 10.0))
    assert(row.getAs[Double]("ratio_b") ~== r6(21.0 / 9.0))
    assert(row.getAs[Double]("diff") ~== r6(21.0 / 9.0 - 18.0 / 10.0))
    // independent delta-variance replay for arm a
    def varR(rows: Seq[(Double, Double)]): Double = {
      val n = rows.size.toDouble
      val (sy, sn) = (rows.map(_._1).sum, rows.map(_._2).sum)
      val r = sy / sn
      val nbar = sn / n
      val vy = (rows.map(t => t._1 * t._1).sum - sy * sy / n) / (n - 1)
      val vn = (rows.map(t => t._2 * t._2).sum - sn * sn / n) / (n - 1)
      val cyn = (rows.map(t => t._1 * t._2).sum - sy * sn / n) / (n - 1)
      (vy - 2 * r * cyn + r * r * vn) / (nbar * nbar) / n
    }
    val va = varR(a.map(t => (t._2, t._3)))
    val vb = varR(b.map(t => (t._2, t._3)))
    assert(row.getAs[Double]("var_a") ~== (r6(va), 1e-6))
    assert(row.getAs[Double]("var_b") ~== (r6(vb), 1e-6))
    assert(row.getAs[Double]("z")
      ~== (r6((21.0 / 9.0 - 1.8) / math.sqrt(va + vb)), 1e-6))
  }

  test("A/A: identical unit multisets give diff 0, z 0, equal variances") {
    val units = Seq((4.0, 2.0), (6.0, 3.0), (10.0, 4.0), (1.0, 1.0))
    val rows = units.map { case (y, n) => (0L, y, n) } ++
      units.map { case (y, n) => (1L, y, n) }
    val row = run(rows)
    assert(row.getAs[Double]("diff") ~== 0.0)
    assert(row.getAs[Double]("z") ~== 0.0)
    assert(row.getAs[Double]("var_a") ~== row.getAs[Double]("var_b"))
    assert(row.getAs[Double]("se") > 0.0)
  }

  test("variance scales as 1/N when the unit mix replicates") {
    val units = Seq((4.0, 2.0), (6.0, 3.0), (10.0, 4.0), (3.0, 2.0))
    val x1 = run(units.map { case (y, n) => (0L, y, n) }
      ++ Seq((1L, 1.0, 1.0), (1L, 2.0, 1.0), (1L, 2.0, 2.0)))
    val x4 = run((1 to 4).flatMap(_ =>
      units.map { case (y, n) => (0L, y, n) })
      ++ Seq((1L, 1.0, 1.0), (1L, 2.0, 1.0), (1L, 2.0, 2.0)))
    // replicating the arm-a mix 4× leaves the ratio identical and
    // shrinks the delta variance by (N₄/N₁)·(s²₁/s²₄); with N 4→16 the
    // (N−1) corrections make that exactly 4·(15/12) = 5
    val ratio = x1.getAs[Double]("var_a") / x4.getAs[Double]("var_a")
    assert(ratio > 4.9 && ratio < 5.1, s"got ratio $ratio")
    assert(x1.getAs[Double]("ratio_a") ~== x4.getAs[Double]("ratio_a"))
  }
}
