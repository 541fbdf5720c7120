package graft.metrics

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConformalSpec extends SparkSpec {
  import spark.implicits._

  /** Linear truth + symmetric noise; key unique per row. */
  private def corpus(n: Int, seed: Int) = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      val x = rnd.nextDouble() * 10
      (i.toLong, x, 3.0 * x + 2.0 + rnd.nextGaussian())
    }.toDF("id", "x", "y")
  }

  test("finite-sample path: empirical coverage >= 1 - alpha") {
    val r = Conformal.splitConformalOls(corpus(20000, 7), "x", "y",
        col("id").cast("string"), alpha = 0.1, finiteSample = true)
      .collect().head
    val coverage = r.getDouble(3)
    // conformal guarantee: E[coverage] >= 0.9; the finite-sample level
    // makes it hold non-asymptotically (slack for test-split noise)
    assert(coverage >= 0.89, s"coverage $coverage")
    assert(r.getLong(0) > 1000 && r.getLong(1) > 1000)
  }

  test("finite-sample level exceeds the asymptotic level on small calib") {
    val df = corpus(400, 11)
    val fs = Conformal.splitConformalOls(df, "x", "y",
        col("id").cast("string"), alpha = 0.2, finiteSample = true)
      .collect().head.getDouble(2)
    val asym = Conformal.splitConformalOls(df, "x", "y",
        col("id").cast("string"), alpha = 0.2, finiteSample = false)
      .collect().head.getDouble(2)
    // ceil((n+1)(1-a))/n > 1-a, so qhat_fs >= qhat_asym always
    assert(fs >= asym, s"fs $fs < asym $asym")
  }

  test("qhat shrinks as alpha grows (wider miscoverage, tighter band)") {
    val df = corpus(5000, 3)
    val q10 = Conformal.splitConformalOls(df, "x", "y",
        col("id").cast("string"), alpha = 0.1, finiteSample = false)
      .collect().head.getDouble(2)
    val q50 = Conformal.splitConformalOls(df, "x", "y",
        col("id").cast("string"), alpha = 0.5, finiteSample = false)
      .collect().head.getDouble(2)
    assert(q50 < q10, s"q(0.5)=$q50 !< q(0.1)=$q10")
  }

  test("noise-free corpus gives ~zero qhat and full coverage") {
    val df = (0 until 2000).map { i =>
      val x = i / 100.0
      (i.toLong, x, 3.0 * x + 2.0)
    }.toDF("id", "x", "y")
    val r = Conformal.splitConformalOls(df, "x", "y",
        col("id").cast("string"), alpha = 0.1, finiteSample = true)
      .collect().head
    assert(r.getDouble(2) < 1e-3, s"qhat ${r.getDouble(2)}")
    assert(r.getDouble(3) == 1.0)
  }
}
