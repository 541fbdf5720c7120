package graft.metrics

import org.apache.spark.sql.{DataFrame, Row}

import graft.SparkSpec

/** Log-rank test: symmetric-cohort degeneracy, an independent
  * driver-side replay of the hypergeometric sums on a hand dataset,
  * the O_A + O_B accounting identity, and the two-sample guard.
  */
class LogRankSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Boolean, String)]): Row =
    Survival.logRank(rows.toDF("duration", "event", "grp"),
      "duration", "event", "grp").head()

  test("identical cohorts: observed equals expected, chi2 = 0") {
    val base = Seq((1L, true), (2L, true), (3L, false), (5L, true))
    val rows = base.map { case (t, e) => (t, e, "a") } ++
      base.map { case (t, e) => (t, e, "b") }
    val r = run(rows)
    assert(r.getAs[Long]("o_a") == 3L)
    assert(r.getAs[Double]("e_a") ~== 3.0)
    assert(r.getAs[Double]("chi2") ~== 0.0)
  }

  test("independent replay of the hypergeometric sums on a hand case") {
    // group a dies early (1, 2), group b late (3, 4); one censored each
    val rows = Seq(
      (1L, true, "a"), (2L, true, "a"), (2L, false, "a"),
      (3L, true, "b"), (4L, true, "b"), (5L, false, "b"))
    // replay: event times with d>0: t=1 (n=6, na=3, d=1, da=1),
    // t=2 (n=5, na=2, d=1, da=1), t=3 (n=3, na=0, d=1, da=0),
    // t=4 (n=2, na=0, d=1, da=0)
    val table = Seq(
      (6.0, 3.0, 1.0, 1L), (5.0, 2.0, 1.0, 1L),
      (3.0, 0.0, 1.0, 0L), (2.0, 0.0, 1.0, 0L))
    val eA = table.map { case (n, na, d, _) => d * na / n }.sum
    val vT = table.map { case (n, na, d, _) =>
      d * (na / n) * (1 - na / n) * (n - d) / (n - 1) }.sum
    val oA = table.map(_._4).sum
    val r = run(rows)
    assert(r.getAs[String]("group_a") == "a")
    assert(r.getAs[Long]("o_a") == oA)
    assert(r.getAs[Double]("e_a") ~== BigDecimal(eA)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("chi2") ~== BigDecimal(
        (oA - eA) * (oA - eA) / vT)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("accounting: O_A + O_B = total events, E_A + E_B = total events") {
    val rows = Seq(
      (1L, true, "x"), (2L, false, "x"), (4L, true, "x"), (6L, true, "x"),
      (1L, true, "y"), (3L, true, "y"), (5L, false, "y"))
    val r = run(rows)
    val d = rows.count(_._2).toLong
    assert(r.getAs[Long]("o_a") + r.getAs[Long]("o_b") == d)
    assert(r.getAs[Double]("e_a") + r.getAs[Double]("e_b") ~== d.toDouble,
      1e-6)
  }

  test("not a two-sample input: reject") {
    intercept[IllegalArgumentException] {
      run(Seq((1L, true, "a"), (2L, true, "b"), (3L, true, "c")))
    }
    intercept[IllegalArgumentException] {
      run(Seq((1L, true, "a"), (2L, true, "a")))
    }
  }
}
