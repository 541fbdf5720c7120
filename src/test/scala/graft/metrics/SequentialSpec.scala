package graft.metrics

import graft.SparkSpec

/** Temperature scaling + SPRT: independent driver-side replays, the
  * margin/temperature scaling identity, and Wald boundary crossings.
  */
class SequentialSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("temperatureScan: independent NLL replay and argmin flag") {
    val rows = Seq((1.0, 2.0), (0.0, -1.0), (1.0, 0.5), (0.0, -3.0))
    val grid = Seq(0.5, 1.0, 2.0)
    val got = Metrics.temperatureScan(rows.toDF("y", "m"), "y", "m", grid)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getBoolean(2)))
      .toSeq.sortBy(_._1)
    def nll(t: Double): Double = r6(rows.map { case (y, m) =>
      val z = m / t
      val sp = math.log(1.0 + math.exp(-z))
      if (y > 0) sp else z + sp
    }.sum / rows.size)
    val expectedBest = grid.map(t => (nll(t), t)).min._2
    got.foreach { case (t, n, best) =>
      assert(n ~== nll(t))
      assert(best == (t == expectedBest))
    }
  }

  test("scaling identity: margins x2 at temperature 2T = original NLL") {
    val rows = Seq((1.0, 2.0), (0.0, -1.5), (1.0, 0.25), (0.0, -0.75))
    val base = Metrics.temperatureScan(rows.toDF("y", "m"), "y", "m",
        Seq(0.5, 1.0, 2.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val scaled = Metrics.temperatureScan(
        rows.map { case (y, m) => (y, 2 * m) }.toDF("y", "m"), "y", "m",
        Seq(1.0, 2.0, 4.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    Seq(0.5, 1.0, 2.0).foreach { t =>
      assert(base(t) ~== scaled(2 * t), s"T=$t")
    }
  }

  test("sprtBinomial: independent replay of LLR, cumsum, decisions") {
    // day 1: 10 trials 3 successes; day 2: 20/2; day 3: 10/9
    val rows = Seq.fill(3)((1, 1L, 1L)) ++ Seq.fill(7)((1, 1L, 0L)) ++
      Seq.fill(2)((2, 1L, 1L)) ++ Seq.fill(18)((2, 1L, 0L)) ++
      Seq.fill(9)((3, 1L, 1L)) ++ Seq.fill(1)((3, 1L, 0L))
    val (p0, p1) = (0.2, 0.4)
    val got = Experiment.sprtBinomial(rows.toDF("day", "trial", "succ"),
        "day", "trial", "succ", p0, p1)
      .orderBy("day").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getString(5)))
    val c1 = math.log(p1 / p0); val c2 = math.log((1 - p1) / (1 - p0))
    val lo = math.log(0.2 / 0.95); val hi = math.log(0.8 / 0.05)
    val days = Seq((1, 10L, 3L), (2, 20L, 2L), (3, 10L, 9L))
    var cum = 0.0
    val expected = days.map { case (d, n, x) =>
      val llr = x * c1 + (n - x) * c2
      cum += llr
      val cr = r6(cum)
      val dec = if (cr >= hi) "accept_h1"
        else if (cr <= lo) "accept_h0" else "continue"
      (d, n, x, r6(llr), cr, dec)
    }
    assert(got.toSeq == expected)
  }

  test("strong signals cross the Wald boundaries") {
    // all successes under p1 > p0 -> accept_h1; all failures -> accept_h0
    val up = (1 to 5).flatMap(d => Seq.fill(30)((d, 1L, 1L)))
    val dn = (1 to 5).flatMap(d => Seq.fill(30)((d, 1L, 0L)))
    val dUp = Experiment.sprtBinomial(up.toDF("day", "trial", "succ"),
      "day", "trial", "succ", 0.2, 0.4).orderBy("day")
      .collect().map(_.getString(5))
    val dDn = Experiment.sprtBinomial(dn.toDF("day", "trial", "succ"),
      "day", "trial", "succ", 0.2, 0.4).orderBy("day")
      .collect().map(_.getString(5))
    assert(dUp.last == "accept_h1" && dDn.last == "accept_h0")
  }

  test("degenerate p0 = p1 is rejected") {
    intercept[IllegalArgumentException] {
      Experiment.sprtBinomial(Seq((1, 1L, 1L)).toDF("day", "trial", "succ"),
        "day", "trial", "succ", 0.3, 0.3)
    }
  }
}
