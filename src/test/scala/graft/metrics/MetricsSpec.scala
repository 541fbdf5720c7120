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

  test("confusion matrix + PRF1: never-predicted class keeps its row at P=0") {
    import spark.implicits._
    // truth:  a a a b b c ; pred: a a b b b a  — 'c' never predicted
    val d = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"),
      ("c", "a")).toDF("y", "p")
    val cm = Metrics.confusionMatrix(d, "y", "p")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cm == Map(("a", "a") -> 2L, ("a", "b") -> 1L, ("b", "b") -> 2L,
      ("c", "a") -> 1L))
    val prf = Metrics.precisionRecallF1(d, "y", "p")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(prf("a") == (((2L, 1L, 1L), 0.666667, 0.666667, 0.666667)),
      "values carry the round-6 output convention")
    assert(prf("b")._1 == ((2L, 1L, 0L)))
    assert(prf("b")._3 == 1.0, "recall(b) = 2/2")
    assert(prf("c") == (((0L, 0L, 1L), 0.0, 0.0, 0.0)),
      "never-predicted class: sklearn zero-division=0 convention")
  }

  test("rocAuc equals the brute-force pair statistic, ties counted half") {
    import spark.implicits._
    val rows = Seq((1.0, 0.9), (1.0, 0.5), (1.0, 0.5), (0.0, 0.5),
      (0.0, 0.3), (0.0, 0.1), (1.0, 0.2))
    val d = rows.toDF("y", "s")
    val pos = rows.filter(_._1 == 1.0).map(_._2)
    val neg = rows.filter(_._1 == 0.0).map(_._2)
    val brute = (for { p <- pos; n <- neg } yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum / (pos.size * neg.size)
    assert(Metrics.rocAuc(d, "y", "s") ~== brute)
    // perfect separation and degenerate single-class input
    val perfect = Seq((1.0, 2.0), (1.0, 3.0), (0.0, 1.0)).toDF("y", "s")
    assert(Metrics.rocAuc(perfect, "y", "s") ~== 1.0)
    val oneClass = Seq((1.0, 2.0), (1.0, 3.0)).toDF("y", "s")
    assert(Metrics.rocAuc(oneClass, "y", "s").isNaN)
  }

  test("averagePrecision matches the hand-computed step form, ties collapsed") {
    import spark.implicits._
    // desc thresholds: 0.9 (1 pos) → P=1, R=1/3; 0.5 (1 pos of 3 rows,
    // tie group) → P=2/4, R=2/3; 0.2 (1 pos) → P=3/6, R=1
    val d = Seq((1.0, 0.9), (1.0, 0.5), (0.0, 0.5), (0.0, 0.5),
      (0.0, 0.3), (1.0, 0.2)).toDF("y", "s")
    val expected = (1.0 / 3) * 1.0 + (1.0 / 3) * (2.0 / 4) + (1.0 / 3) * (3.0 / 6)
    assert(Metrics.averagePrecision(d, "y", "s") ~== expected)
    // perfect ranking → AP 1; no positives → NaN
    val perfect = Seq((1.0, 3.0), (1.0, 2.0), (0.0, 1.0)).toDF("y", "s")
    assert(Metrics.averagePrecision(perfect, "y", "s") ~== 1.0)
    assert(Metrics.averagePrecision(
      Seq((0.0, 1.0)).toDF("y", "s"), "y", "s").isNaN)
  }

  test("calibrationBins: p=1.0 clamps into the last bin; ECE is the weighted gap sum") {
    import spark.implicits._
    val d = Seq((1.0, 1.0), (1.0, 0.95), (0.0, 0.91), // bin 9: conf ~.953, acc 2/3
      (0.0, 0.05), (0.0, 0.01), (1.0, 0.02))          // bin 0: conf ~.027, acc 1/3
      .toDF("y", "p")
    val bins = Metrics.calibrationBins(d, "y", "p")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(bins.keySet == Set(0, 9), "p=1.0 lands in bin 9, not a phantom bin 10")
    assert(bins(9)._1 == 3 && bins(0)._1 == 3)
    val ece = Metrics.expectedCalibrationError(d, "y", "p")
    val expected = (3 * bins(0)._4 + 3 * bins(9)._4) / 6
    assert(ece ~== expected)
  }

  test("agreementStats: binary MCC/kappa match the closed forms") {
    import spark.implicits._
    // y=[1,1,0,0,1], p=[1,0,0,0,1] → tp=2 tn=2 fp=0 fn=1
    val d = Seq(("1", "1"), ("1", "0"), ("0", "0"), ("0", "0"), ("1", "1"))
      .toDF("y", "p")
    val (mcc, kappa) = Metrics.agreementStats(d, "y", "p")
    // MCC = (2·2 − 0·1)/sqrt(2·3·2·3) = 4/6
    assert(mcc ~== 4.0 / 6.0)
    // po=0.8, pe=(3·2 + 2·3)/25=0.48 → (0.8−0.48)/0.52
    assert(kappa ~== 0.32 / 0.52)
  }

  test("agreementStats: perfect agreement is 1/1; constant prediction is 0/0") {
    import spark.implicits._
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c")).toDF("y", "p")
    val (m1, k1) = Metrics.agreementStats(perfect, "y", "p")
    assert(m1 ~== 1.0); assert(k1 ~== 1.0)
    // constant pred: MCC denominator s²−Σp² = 0 → 0; kappa po=pe → 0
    val const = Seq(("a", "a"), ("b", "a")).toDF("y", "p")
    val (m2, k2) = Metrics.agreementStats(const, "y", "p")
    assert(m2 == 0.0); assert(k2 ~== 0.0)
  }

  test("ndcgPerQuery matches hand-computed DCG/IDCG; zero relevance -> 0") {
    import spark.implicits._
    // q1: rels by rank [0,1,1] → DCG = 1/log2(3) + 1/log2(4);
    //     ideal [1,1,0] → IDCG = 1/log2(2) + 1/log2(3)
    // q2: all zero → 0
    val d = Seq((1L, 1, 0), (1L, 2, 1), (1L, 3, 1),
      (2L, 1, 0), (2L, 2, 0)).toDF("q", "rank", "rel")
    val r = Metrics.ndcgPerQuery(d, "q", "rank", "rel")
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val log2 = (v: Double) => math.log(v) / math.log(2.0)
    val expected = (1 / log2(3) + 1 / log2(4)) / (1 / log2(2) + 1 / log2(3))
    assert(r(1L) ~== (BigDecimal(expected).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble, 1e-9))
    assert(r(2L) == 0.0)
  }

  test("retrievalReport: MRR uses first relevant rank; zero-hit query scores 0") {
    import spark.implicits._
    val d = Seq(
      (1L, 1, 0, 4L), (1L, 2, 1, 4L), (1L, 3, 1, 4L), // first hit at rank 2
      (2L, 1, 0, 3L), (2L, 2, 0, 3L))                 // no hits
      .toDF("q", "rank", "rel", "total_rel")
    val r = Metrics.retrievalReport(d, "q", "rank", "rel", "total_rel", k = 5)
      .collect().map(x => x.getLong(0) ->
        ((x.getDouble(1), x.getDouble(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((0.5, 0.4, 0.5)))  // 1/2, 2/5, 2/4
    assert(r(2L) == ((0.0, 0.0, 0.0)))
  }

  test("agreementStats: class never predicted still counts in the marginals") {
    import spark.implicits._
    // 'c' never predicted: p-marginal for c is 0 but t_c=1 joins via full-outer
    val d = Seq(("a", "a"), ("b", "b"), ("c", "a")).toDF("y", "p")
    val (mcc, kappa) = Metrics.agreementStats(d, "y", "p")
    // s=3 c=2, t=[1,1,1], p=[2,1,0]: Σtp=3, Σtt=3, Σpp=5
    assert(mcc ~== (2 * 3 - 3) / math.sqrt((9.0 - 5) * (9.0 - 3)))
    assert(kappa ~== (2.0 / 3 - 3.0 / 9) / (1 - 3.0 / 9))
  }
}
