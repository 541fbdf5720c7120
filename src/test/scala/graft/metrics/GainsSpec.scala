package graft.metrics

import scala.util.Random

import graft.SparkSpec

class GainsSpec extends SparkSpec {
  import spark.implicits._

  test("perfectly ranked labels: top deciles capture all the gain") {
    // 100 rows, scores 1..100, positives = top 20 scores
    val df = (1 to 100).map(i => (i.toDouble, i > 80)).toDF("s", "y")
    val got = Gains.gainsChart(df, "s", "y").orderBy("decile").collect()
    assert(got.length == 10)
    assert(got.map(_.getLong(1)).sum == 100)
    val byDecile = got.map(r => r.getInt(0) ->
      (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // decile 1 = top 10 scores: 10 positives, half the gain, lift 5
    assert(byDecile(1)._1 == 10 && byDecile(1)._2 == 0.5
      && byDecile(1)._3 == 5.0, byDecile(1))
    assert(byDecile(2)._2 == 1.0) // top 20 capture everything
    assert(byDecile(10)._2 == 1.0 && byDecile(10)._3 == 1.0)
    (3 to 10).foreach(d => assert(byDecile(d)._1 == 0))
  }

  test("random scores: every decile near base rate, lift ~ 1") {
    val rnd = new Random(11)
    val df = (1 to 5000).map(_ => (rnd.nextDouble(), rnd.nextBoolean()))
      .toDF("s", "y")
    val got = Gains.gainsChart(df, "s", "y").orderBy("decile").collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(4) - 1.0) < 0.15,
        s"decile ${r.getInt(0)} lift ${r.getDouble(4)}")
    }
    assert(got.last.getDouble(3) == 1.0)
  }

  test("cum_gain is monotone and ends at 1") {
    val rnd = new Random(3)
    val df = (1 to 2000).map(_ =>
      (rnd.nextGaussian(), rnd.nextDouble() < 0.3)).toDF("s", "y")
    val gains = Gains.gainsChart(df, "s", "y").orderBy("decile")
      .collect().map(_.getDouble(3))
    gains.zip(gains.tail).foreach { case (a, b) => assert(a <= b) }
    assert(gains.last == 1.0)
  }
}
