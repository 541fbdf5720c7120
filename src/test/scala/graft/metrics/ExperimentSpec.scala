package graft.metrics

import scala.util.Random

import org.apache.spark.sql.Row

import graft.SparkSpec

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  /** Randomized experiment with a pre-period covariate that explains
    * most of the between-unit variance: y = x + effect·variant + noise.
    */
  private def corpus(n: Int, effect: Double, seed: Int,
      rho: Double = 1.0) = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      val x = 50 + 10 * rnd.nextGaussian()
      val v = i % 2
      (v, rho * x + effect * v + rnd.nextGaussian(), x)
    }.toDF("variant", "y", "x")
  }

  private def report(df: org.apache.spark.sql.DataFrame): Row =
    Experiment.cupedReport(df, "variant", "y", "x").collect().head

  test("CUPED removes covariate-explained variance and sharpens the test") {
    val r = report(corpus(4000, effect = 0.5, seed = 1))
    val varRed = r.getAs[Double]("var_reduction")
    assert(varRed > 0.9, s"var_reduction $varRed") // x explains ~99%
    val tRaw = math.abs(r.getAs[Double]("t_raw"))
    val tCuped = math.abs(r.getAs[Double]("t_cuped"))
    assert(tCuped > 3 * tRaw, s"t_raw $tRaw t_cuped $tCuped")
    // the adjusted lift still estimates the true effect
    assert(math.abs(r.getAs[Double]("lift_cuped") - 0.5) < 0.15, r)
  }

  test("raw and adjusted lifts agree in expectation (CUPED is unbiased)") {
    val r = report(corpus(20000, effect = 2.0, seed = 7))
    assert(math.abs(r.getAs[Double]("lift_raw")
      - r.getAs[Double]("lift_cuped")) < 0.5, r)
    assert(math.abs(r.getAs[Double]("lift_cuped") - 2.0) < 0.1, r)
  }

  test("uninformative covariate: theta ~ 0, no variance reduction") {
    val r = report(corpus(4000, effect = 0.5, seed = 3, rho = 0.0))
    assert(math.abs(r.getAs[Double]("theta")) < 0.05, r)
    assert(math.abs(r.getAs[Double]("var_reduction")) < 0.05, r)
  }

  test("constant covariate degrades to the raw test (theta = 0)") {
    val df = corpus(1000, effect = 1.0, seed = 4)
      .withColumn("x", org.apache.spark.sql.functions.lit(3.0))
    val r = report(df)
    assert(r.getAs[Double]("theta") == 0.0, r)
    assert(r.getAs[Double]("t_raw") == r.getAs[Double]("t_cuped"), r)
  }

  test("welch df sits between min(n)-1 and n_a+n_b-2") {
    val r = report(corpus(500, effect = 0.0, seed = 5))
    val df0 = r.getAs[Double]("df_cuped")
    assert(df0 > 248 && df0 <= 498, s"df $df0")
  }

  test("three variants yield an empty report, never a wrong one") {
    val df = Seq((0, 1.0, 1.0), (1, 2.0, 1.0), (2, 3.0, 1.0))
      .toDF("variant", "y", "x")
    assert(Experiment.cupedReport(df, "variant", "y", "x").count() == 0)
  }
}
