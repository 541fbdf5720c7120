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
}
