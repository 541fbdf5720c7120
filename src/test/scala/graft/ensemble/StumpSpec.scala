package graft.ensemble

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Histogram split finding vs a brute-force enumeration, plus the
  * separability and tie-break contracts. */
class StumpSpec extends SparkSpec {

  import spark.implicits._

  private def brute(rows: Seq[(Int, Boolean)]): (Int, Double) = {
    val bins = rows.map(_._1).distinct.sorted
    val nt = rows.length.toDouble
    val pt = rows.count(_._2).toDouble
    def gini(p: Double, n: Double) =
      1.0 - math.pow(p / n, 2) - math.pow((n - p) / n, 2)
    val cands = bins.init.map { t =>
      val l = rows.filter(_._1 <= t)
      val nl = l.length.toDouble; val pl = l.count(_._2).toDouble
      val dec = gini(pt, nt) -
        (nl / nt * gini(pl, nl) + (nt - nl) / nt * gini(pt - pl, nt - nl))
      (t, BigDecimal(dec).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    cands.maxBy { case (t, d) => (d, -t) }
  }

  test("agrees with brute-force enumeration on random frames") {
    val rnd = new scala.util.Random(17)
    (1 to 4).foreach { _ =>
      val rows = (1 to 400).map(_ =>
        (rnd.nextInt(9), rnd.nextDouble() < 0.3 + 0.06 * rnd.nextInt(9)))
      val (bt, bd) = brute(rows)
      val got = Stump.bestSplits(rows.toDF("x", "y"),
        Seq("x" -> col("x")), col("y")).head()
      assert(got.getAs[Int]("threshold") === bt)
      assert(got.getAs[Double]("gini_decrease") === bd)
    }
  }

  test("perfect separation recovers the boundary with decrease = parent gini") {
    val rows = (1 to 100).map(i => (if (i <= 40) 1 else 7, i <= 40))
    val got = Stump.bestSplits(rows.toDF("x", "y"),
      Seq("x" -> col("x")), col("y")).head()
    assert(got.getAs[Int]("threshold") === 1)
    assert(got.getAs[Double]("gini_decrease") ===
      got.getAs[Double]("parent_gini"))
    assert(got.getAs[Long]("n_left") === 40L)
  }

  test("ties break to the smallest threshold") {
    // y constant: every split has decrease 0 → threshold = min bin
    val rows = (1 to 60).map(i => (i % 5, true))
    val got = Stump.bestSplits(rows.toDF("x", "y"),
      Seq("x" -> col("x")), col("y")).head()
    assert(got.getAs[Double]("gini_decrease") === 0.0)
    assert(got.getAs[Int]("threshold") === 0)
  }
}
