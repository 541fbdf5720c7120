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

  test("diff-in-diff recovers an injected effect under parallel trends") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    // base level differs by group, both drift +2.0 post; treatment
    // adds +5.0 on top for (treated, post) only
    val rows = for {
      t <- Seq(false, true); p <- Seq(false, true); _ <- 1 to 800
    } yield {
      val base = (if (t) 10.0 else 3.0) + (if (p) 2.0 else 0.0)
      val eff = if (t && p) 5.0 else 0.0
      (t, p, base + eff + rnd.nextGaussian())
    }
    val r = Experiment.diffInDiff(rows.toDF("t", "p", "y"),
      col("t"), col("p"), "y").head()
    assert(r.getAs[Double]("did") ~== (5.0, 0.2))
    assert(r.getAs[Double]("t") > 10.0) // strongly significant
    assert(r.getAs[Long]("n_tpost") === 800L)
  }

  test("two-proportion z-test matches the hand formula and flags lift") {
    import org.apache.spark.sql.functions._
    // variant 0: 200/1000, variant 1: 260/1000
    val rows = (1 to 1000).map(i => ("0", i <= 200)) ++
      (1 to 1000).map(i => ("1", i <= 260))
    val r = Experiment.proportionsZTest(rows.toDF("v", "s"), "v", col("s"))
      .head()
    assert(r.getAs[Long]("conv_a") === 200L)
    assert(r.getAs[Double]("lift_abs") ~== (0.06, 1e-9))
    val p = 460.0 / 2000
    val z = 0.06 / math.sqrt(p * (1 - p) * (2.0 / 1000))
    assert(r.getAs[Double]("z") ~== (BigDecimal(z).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble, 1e-6))
  }

  test("SRM check flags a skewed assignment and clears a balanced one") {
    import org.apache.spark.sql.functions.col
    val skewed = ((1 to 700).map(_ => "a") ++ (1 to 300).map(_ => "b"))
      .toDF("v")
    val terms = Experiment.srmCheck(skewed, "v",
      Map("a" -> 0.5, "b" -> 0.5)).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("chi2_term")).toMap
    // chi2 = (700-500)^2/500 + (300-500)^2/500 = 160 ≫ 3.84 (α=.05, df 1)
    assert(terms.values.sum ~== (160.0, 1e-6))
    val fair = ((1 to 500).map(_ => "a") ++ (1 to 500).map(_ => "b"))
      .toDF("v")
    val clean = Experiment.srmCheck(fair, "v",
      Map("a" -> 0.5, "b" -> 0.5)).collect()
    assert(clean.forall(_.getAs[Double]("chi2_term") == 0.0))
    // un-normalized ratios behave identically
    val clean2 = Experiment.srmCheck(fair, "v", Map("a" -> 2.0, "b" -> 2.0))
      .collect()
    assert(clean2.forall(_.getAs[Double]("chi2_term") == 0.0))
  }

  test("proportions test with one variant yields an empty report") {
    import org.apache.spark.sql.functions._
    val df = Seq(("0", true), ("0", false)).toDF("v", "s")
    assert(Experiment.proportionsZTest(df, "v", col("s")).count() == 0)
  }

  test("mann-whitney matches the hand-computed midrank U and tie-corrected z") {
    import org.apache.spark.sql.functions._
    // a = 1..6, b = 4..9: U_b = 31.5 (three half-won ties), ties
    // term Σ(t³−t) = 18, σ = 6.212158, z = 2.173158 (hand-derived
    // from the textbook formulas)
    val rows = Seq(1, 2, 3, 4, 5, 6).map(("a", _)) ++
      Seq(4, 5, 6, 7, 8, 9).map(("b", _))
    val r = Experiment.mannWhitneyU(rows.toDF("v", "y"), "v", col("y"))
      .head()
    assert(r.getAs[String]("variant_a") == "a")
    assert(r.getAs[Long]("n_a") === 6L && r.getAs[Long]("n_b") === 6L)
    assert(r.getAs[Double]("u_b") === 31.5)
    assert(r.getAs[Double]("mu_u") === 18.0)
    assert(r.getAs[Double]("sigma_u") === 6.212158)
    assert(r.getAs[Double]("z") === 2.173158)
  }

  test("mann-whitney: identical distributions give U = mu and z = 0") {
    import org.apache.spark.sql.functions._
    val rows = (1 to 20).flatMap(i => Seq(("a", i % 5), ("b", i % 5)))
    val r = Experiment.mannWhitneyU(rows.toDF("v", "y"), "v", col("y"))
      .head()
    assert(r.getAs[Double]("u_b") === r.getAs[Double]("mu_u"))
    assert(r.getAs[Double]("z") === 0.0)
  }

  test("mann-whitney: direction — stochastically larger b gives z > 0, and swapping flips U") {
    import org.apache.spark.sql.functions._
    val rows = (1 to 30).map(i => ("a", i)) ++ (1 to 30).map(i => ("b", i + 25))
    val r = Experiment.mannWhitneyU(rows.toDF("v", "y"), "v", col("y"))
      .head()
    assert(r.getAs[Double]("z") > 3.0)
    // relabel so the large sample becomes variant a: U_b' = n_a·n_b − U_b
    val sw = (1 to 30).map(i => ("b", i)) ++ (1 to 30).map(i => ("a", i + 25))
    val r2 = Experiment.mannWhitneyU(sw.toDF("v", "y"), "v", col("y"))
      .head()
    assert(r.getAs[Double]("u_b") + r2.getAs[Double]("u_b") === 900.0)
    assert(r2.getAs[Double]("z") === -r.getAs[Double]("z"))
  }

  test("mann-whitney rejects anything but exactly 2 distinct variants") {
    import org.apache.spark.sql.functions._
    // one variant: every row would self-compare into both n_a and n_b
    val one = Seq(("a", 1), ("a", 2)).toDF("v", "y")
    val e1 = intercept[Exception] {
      Experiment.mannWhitneyU(one, "v", col("y")).collect()
    }
    assert(e1.getMessage.contains("exactly 2 distinct variants"))
    // three variants: the middle one would silently vanish from counts
    val three = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("v", "y")
    val e3 = intercept[Exception] {
      Experiment.mannWhitneyU(three, "v", col("y")).collect()
    }
    assert(e3.getMessage.contains("exactly 2 distinct variants"))
  }
}
