package graft.metrics

import graft.SparkSpec

class MetricsSpec extends SparkSpec {

  lazy val df = {
    import spark.implicits._
    Seq(
      (3.0, 2.5, 1.0), (-0.5, 0.0, 2.0), (2.0, 2.0, 1.0), (7.0, 8.0, 3.0)
    ).toDF("y", "p", "w")
  }

  // sklearn oracle values for y=[3,-0.5,2,7], p=[2.5,0,2,8]
  test("mse / rmse / mae match sklearn") {
    assert(Metrics.meanSquaredError(df, "y", "p") ~== 0.375)
    assert(Metrics.meanSquaredError(df, "y", "p", squared = false) ~== math.sqrt(0.375))
    assert(Metrics.meanAbsoluteError(df, "y", "p") ~== 0.5)
  }

  test("r2 matches sklearn") {
    assert(Metrics.r2Score(df, "y", "p") ~== 0.9486081370449679)
  }

  test("r2 degenerate guards: 0/0 -> 1, den=0 -> 0") {
    import spark.implicits._
    val const = Seq((2.0, 2.0), (2.0, 2.0)).toDF("y", "p")
    assert(Metrics.r2Score(const, "y", "p") == 1.0)
    val constBad = Seq((2.0, 1.0), (2.0, 3.0)).toDF("y", "p")
    assert(Metrics.r2Score(constBad, "y", "p") == 0.0)
  }

  test("weighted mae") {
    // sum(|p-y|*w)/sum(w) = (0.5*1 + 0.5*2 + 0 + 1*3)/7
    assert(Metrics.meanAbsoluteError(df, "y", "p", Some("w")) ~== (0.5 + 1.0 + 0.0 + 3.0) / 7)
  }

  test("accuracy normalize & weighted") {
    import spark.implicits._
    val c = Seq(("a", "a", 2.0), ("a", "b", 1.0), ("b", "b", 1.0)).toDF("y", "p", "w")
    assert(Metrics.accuracyScore(c, "y", "p") ~== 2.0 / 3)
    assert(Metrics.accuracyScore(c, "y", "p", normalize = false) ~== 2.0)
    assert(Metrics.accuracyScore(c, "y", "p", Some("w")) ~== 3.0 / 4)
  }

  test("log loss matches sklearn") {
    import spark.implicits._
    // -(ln .9 + ln .9 + ln .8 + ln .7)/4 = 0.1976348816421487
    val d = Seq((1.0, 0.9), (0.0, 0.1), (1.0, 0.8), (0.0, 0.3)).toDF("y", "prob")
    assert(Metrics.logLoss(d, "y", "prob") ~== (0.1976348816421487, 1e-12))
  }

  test("scorer registry resolves and rejects") {
    assert(Scorer.getScorer("r2")(df, "y", "p") ~== 0.9486081370449679)
    intercept[IllegalArgumentException] { Scorer.getScorer("nope") }
  }

  // tests/metrics/test_regression.py multioutput contract
  test("multioutput: raw_values per output, uniform_average is their mean") {
    import spark.implicits._
    val d = Seq((1.0, 1.5, 10.0, 12.0), (2.0, 2.0, 20.0, 18.0),
      (3.0, 2.5, 30.0, 33.0)).toDF("y0", "p0", "y1", "p1")
    val raw = Metrics.regressionMulti(d, "mae", Seq("y0", "y1"), Seq("p0", "p1"),
      "raw_values")
    assert(raw.length == 2)
    assert(raw(0) ~== ((0.5 + 0.0 + 0.5) / 3))
    assert(raw(1) ~== ((2.0 + 2.0 + 3.0) / 3))
    val avg = Metrics.regressionMulti(d, "mae", Seq("y0", "y1"), Seq("p0", "p1"))
    assert(avg.length == 1)
    assert(avg(0) ~== ((raw(0) + raw(1)) / 2))
    // per-output agrees with the single-output metric
    assert(raw(0) ~== Metrics.meanAbsoluteError(d, "y0", "p0"))
  }

  test("multioutput: r2 only uniform_average; weighted multioutput raises") {
    import spark.implicits._
    val d = Seq((1.0, 1.1, 4.0, 4.2), (2.0, 2.2, 5.0, 4.9),
      (3.0, 2.9, 6.0, 6.1)).toDF("y0", "p0", "y1", "p1")
    val r2 = Metrics.r2ScoreMulti(d, Seq("y0", "y1"), Seq("p0", "p1"))
    val expected = (Metrics.r2Score(d, "y0", "p0") + Metrics.r2Score(d, "y1", "p1")) / 2
    assert(r2 ~== expected)
    intercept[NotImplementedError] {
      Metrics.r2ScoreMulti(d, Seq("y0"), Seq("p0"), "raw_values")
    }
    intercept[NotImplementedError] {
      Metrics.regressionMulti(d, "mse", Seq("y0"), Seq("p0"), "weights=[1,2]")
    }
  }
}
