package graft.modelselection

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Hashing

/** OLS learning curve (the sklearn `learning_curve` readout — does
  * more data still help?) computed from ONE corpus pass: because
  * simple-regression fit AND its mean-squared error are both functions
  * of the moment statistics (x̄, ȳ, x̄², x̄y, ȳ²), the whole curve —
  * every training fraction's fit, its training MSE, and its MSE on the
  * held-out test split — derives from one aggregate computing the
  * conditional moments per fraction. Nothing is refit per point and no
  * second pass exists; at 100 TB the curve costs exactly one scan.
  *
  * Splits are the house content-hash buckets (stable under
  * repartitioning and corpus growth): the top `testShare` of the hash
  * space is the fixed test set; training fractions draw NESTED prefixes
  * of the remainder, so each point's training set contains the smaller
  * ones — the learning-curve contract. Moments are rounded 6 at the
  * handoff; every downstream number is fixed-order arithmetic on them.
  */
object LearningCurve {

  /** @return one row per fraction: (fraction, n_train, slope,
    *   intercept, train_mse, test_mse) — n_test constant. */
  def olsCurve(df: DataFrame, xCol: String, yCol: String, idCol: Column,
      fractions: Seq[Double], salt: String = "lc",
      testShare: Double = 0.2): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(f => f > 0 && f <= 1))
    require(testShare > 0 && testShare < 1)
    val spark = df.sparkSession
    import spark.implicits._
    val m = 1000000L
    val testFloor = (m * (1.0 - testShare)).toLong
    val base = df.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y"),
      Hashing.bucket(idCol, salt, m).as("bk"))
    def moments(cond: Column, tag: String): Seq[Column] = Seq(
      sum(when(cond, 1L).otherwise(0L)).as(s"n_$tag"),
      round(avg(when(cond, col("x"))), 6).as(s"ax_$tag"),
      round(avg(when(cond, col("y"))), 6).as(s"ay_$tag"),
      round(avg(when(cond, col("x") * col("x"))), 6).as(s"axx_$tag"),
      round(avg(when(cond, col("x") * col("y"))), 6).as(s"axy_$tag"),
      round(avg(when(cond, col("y") * col("y"))), 6).as(s"ayy_$tag"))
    val trainConds = fractions.zipWithIndex.map { case (f, i) =>
      (i, f, col("bk") < lit((testFloor * f).toLong))
    }
    val aggCols = trainConds.flatMap { case (i, _, c) => moments(c, s"t$i") } ++
      moments(col("bk") >= testFloor, "te")
    val row = base.agg(aggCols.head, aggCols.tail: _*).head()
    def mse(slope: Double, icpt: Double, ax: Double, ay: Double,
        axx: Double, axy: Double, ayy: Double): Double =
      ayy - 2 * slope * axy - 2 * icpt * ay + slope * slope * axx +
        2 * slope * icpt * ax + icpt * icpt
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = trainConds.map { case (i, f, _) =>
      val n = row.getAs[Long](s"n_t$i")
      val (ax, ay) = (row.getAs[Double](s"ax_t$i"), row.getAs[Double](s"ay_t$i"))
      val (axx, axy, ayy) =
        (row.getAs[Double](s"axx_t$i"), row.getAs[Double](s"axy_t$i"),
          row.getAs[Double](s"ayy_t$i"))
      val slope = r6((axy - ax * ay) / (axx - ax * ax))
      val icpt = r6(ay - slope * ax)
      (f, n, slope, icpt,
        r6(mse(slope, icpt, ax, ay, axx, axy, ayy)),
        r6(mse(slope, icpt, row.getAs[Double]("ax_te"),
          row.getAs[Double]("ay_te"), row.getAs[Double]("axx_te"),
          row.getAs[Double]("axy_te"), row.getAs[Double]("ayy_te"))))
    }
    out.toDF("fraction", "n_train", "slope", "intercept",
      "train_mse", "test_mse").orderBy("fraction")
  }
}
