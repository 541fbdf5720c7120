package graft.modelselection

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Learning-curve semantics: the one-pass moment fit equals a direct
  * OLS on the same split, training sets nest, and on a true linear
  * relationship the test MSE improves (or holds) with more data. */
class LearningCurveSpec extends SparkSpec {

  import spark.implicits._

  private lazy val synth = (1 to 4000).map { i =>
    val x = (i % 97).toDouble
    // y = 3x + 7 + deterministic pseudo-noise
    (i.toLong, x, 3.0 * x + 7.0 + ((i * 2654435761L % 1000) - 500) / 250.0)
  }.toDF("id", "x", "y")

  private lazy val curve = LearningCurve.olsCurve(synth, "x", "y",
    col("id").cast("string"), fractions = Seq(0.1, 0.5, 1.0), salt = "lcs")
    .collect()

  test("full-fraction fit matches a direct OLS on the same train split") {
    val full = curve.last
    val m = 1000000L
    val train = synth.withColumn("bk",
        graft.core.Hashing.bucket(col("id").cast("string"), "lcs", m))
      .where(col("bk") < 800000L)
      .select(avg("x"), avg("y"), avg(col("x") * col("x")),
        avg(col("x") * col("y"))).head()
    def r6(v: Double) = BigDecimal(v).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val (ax, ay, axx, axy) = (r6(full.getAs[Double]("slope") * 0 + train.getDouble(0)),
      train.getDouble(1), train.getDouble(2), train.getDouble(3))
    val slope = r6((r6(axy) - r6(ax) * r6(ay)) / (r6(axx) - r6(ax) * r6(ax)))
    assert(full.getAs[Double]("slope") === slope)
    assert(math.abs(full.getAs[Double]("slope") - 3.0) < 0.05)
    assert(math.abs(full.getAs[Double]("intercept") - 7.0) < 1.0)
  }

  test("training sets nest and grow with the fraction") {
    val ns = curve.map(_.getAs[Long]("n_train"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a < b })
  }

  test("test MSE does not blow up as data grows on a stable relationship") {
    val mses = curve.map(_.getAs[Double]("test_mse"))
    assert(mses.forall(m => m > 0 && m < 10.0), mses.toSeq)
    assert(mses.last <= mses.head * 1.5)
  }
}
