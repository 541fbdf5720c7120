package graft.naivebayes

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GaussianNBSpec extends SparkSpec {

  // sklearn GaussianNB oracle on a tiny 2-class set:
  // X = [[1,2],[2,1],[3,2],[7,8],[8,7],[9,8]], y = [0,0,0,1,1,1]
  lazy val df = {
    import spark.implicits._
    Seq((1.0, 2.0, "c0"), (2.0, 1.0, "c0"), (3.0, 2.0, "c0"),
      (7.0, 8.0, "c1"), (8.0, 7.0, "c1"), (9.0, 8.0, "c1"))
      .toDF("x1", "x2", "label")
  }

  test("fit: priors, theta, sigma match closed form") {
    val m = new GaussianNB(Seq("x1", "x2"), "label").fit(df)
    assert(m.classes.toSeq == Seq("c0", "c1"))
    assert(m.classPrior(0) ~== 0.5)
    assert(m.theta(0).toSeq == Seq(2.0, 5.0 / 3))
    assert(m.theta(1).toSeq == Seq(8.0, 23.0 / 3))
    // var_pop(1,2,3) = 2/3
    assert(m.sigma(0)(0) ~== (2.0 / 3, 1e-6))
  }

  test("predict separates the clusters; proba sums to 1") {
    val m = new GaussianNB(Seq("x1", "x2"), "label").fit(df)
    val pred = m.transform(df).select("label", "prediction").collect()
    assert(pred.forall(r => r.getString(0) == r.getString(1)))
    val probs = m.predictProba(df)
      .select((col("proba_c0") + col("proba_c1")).as("s")).collect()
    assert(probs.forall(r => r.getDouble(0) ~== 1.0))
  }

  test("predict on shifted points goes to the nearer class") {
    import spark.implicits._
    val m = new GaussianNB(Seq("x1", "x2"), "label").fit(df)
    val probe = Seq((1.5, 1.5, "?"), (8.5, 8.5, "?")).toDF("x1", "x2", "label")
    val out = m.transform(probe).select("prediction").collect().map(_.getString(0))
    assert(out.toSeq == Seq("c0", "c1"))
  }
}
