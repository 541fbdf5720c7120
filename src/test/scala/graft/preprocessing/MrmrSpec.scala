package graft.preprocessing

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** mRMR: pair-MI values on hand data, the redundancy-avoidance greedy
  * path on crafted scores, and rank-1 agreement with SelectKBest.
  */
class MrmrSpec extends SparkSpec {
  import spark.implicits._

  test("pairScores: copied feature has MI = H, independent has MI = 0") {
    val df = Seq(0, 0, 1, 1, 0, 0, 1, 1).zipWithIndex
      .map { case (p, i) => (p, p, i % 2) }
      .toDF("p", "q", "r")
    val got = FeatureSelection.pairScores(df,
        Seq("p" -> col("p"), "q" -> col("q"), "r" -> col("r")))
      .collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2)).toMap
    val h2 = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("p", "q")) ~== h2)   // exact copy: MI = H(p) = ln 2
    assert(got(("p", "r")) ~== 0.0)  // independent by construction
    assert(got(("q", "r")) ~== 0.0)
  }

  test("greedy avoids the redundant copy despite equal relevance") {
    val rel = Seq(("a", 0.5), ("b", 0.5), ("c", 0.2)).toDF("feature", "mi")
    val red = Seq(("a", "b", 0.7), ("a", "c", 0.01), ("b", "c", 0.01))
      .toDF("feature_a", "feature_b", "mi")
    val got = FeatureSelection.mrmrSelect(rel, red, k = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)
    // rank 1: relevance tie a/b -> name; rank 2: c (0.2 - 0.01 = 0.19)
    // beats the copy b (0.5 - 0.7 = -0.2); rank 3: b with the mean
    // redundancy (0.7 + 0.01) / 2
    assert(got == Seq((1, "a", 0.5), (2, "c", 0.19), (3, "b", 0.145)))
  }

  test("rank 1 is exactly the SelectKBest top feature") {
    val li = graft.core.Tables.lineitem(spark, sfDir)
    val feats = Seq(
      "ship_year" -> year(col("l_shipdate")),
      "quantity_bucket" -> floor(col("l_quantity") / 10).cast("int"),
      "discount_pct" -> round(col("l_discount") * 100).cast("int"))
    val scores = FeatureSelection.scores(li, feats, col("l_returnflag"))
    val top = FeatureSelection.selectKBest(scores, 1)
      .head().getAs[String]("feature")
    val r1 = FeatureSelection.mrmrSelect(scores,
        FeatureSelection.pairScores(li, feats), k = 1)
      .head()
    assert(r1.getInt(0) == 1 && r1.getString(1) == top)
  }

  test("k out of range is rejected") {
    val rel = Seq(("a", 0.5), ("b", 0.4)).toDF("feature", "mi")
    val red = Seq(("a", "b", 0.1)).toDF("feature_a", "feature_b", "mi")
    intercept[IllegalArgumentException] {
      FeatureSelection.mrmrSelect(rel, red, k = 3)
    }
  }
}
