package graft.preprocessing

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Analytical invariants the exact-replay gates can't express: MI is
  * (near-)zero under independence, positive and ranked first for a
  * feature that determines the label, and chi2 grows with association.
  */
class FeatureSelectionSpec extends SparkSpec {

  import spark.implicits._

  // label = parity of x; "det" determines it, "rand" is independent
  private lazy val df = (0 until 2000)
    .map(i => (i, i % 2, (i * 2654435761L % 97 % 7).toInt))
    .toDF("id", "det", "rand")
    .withColumn("label", col("id") % 2)

  private lazy val scores = FeatureSelection.scores(df,
    Seq("det" -> col("det"), "rand" -> col("rand")), col("label"))
    .collect().map(r => r.getAs[String]("feature") -> r).toMap

  test("a label-determining feature scores ln(2) MI; independent ~0") {
    val det = scores("det")
    assert(det.getAs[Double]("mi") ~== (math.log(2.0), 1e-4))
    val rand = scores("rand")
    assert(math.abs(rand.getAs[Double]("mi")) < 0.01)
    assert(det.getAs[Double]("chi2") > rand.getAs[Double]("chi2"))
  }

  test("dof is (bins-1)(classes-1) and selectKBest ranks by MI") {
    assert(scores("det").getAs[Long]("dof") === 1L)
    val top = FeatureSelection.selectKBest(
      FeatureSelection.scores(df,
        Seq("det" -> col("det"), "rand" -> col("rand")), col("label")), 1)
      .head().getAs[String]("feature")
    assert(top === "det")
  }

  test("chi2 for a perfectly associated 2x2 table equals n") {
    // contingency [[1000,0],[0,1000]]: chi2 = n = 2000
    assert(scores("det").getAs[Double]("chi2") ~== (2000.0, 1e-6))
  }
}
