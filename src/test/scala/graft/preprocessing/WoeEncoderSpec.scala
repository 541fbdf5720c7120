package graft.preprocessing

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WoeEncoderSpec extends SparkSpec {
  import spark.implicits._

  // category A: 3 pos / 1 neg; B: 1 pos / 3 neg — symmetric evidence
  private val df = Seq(
    ("A", true), ("A", true), ("A", true), ("A", false),
    ("B", true), ("B", false), ("B", false), ("B", false))
    .toDF("cat", "y")

  test("woe is symmetric and signed toward the evidence") {
    val m = WoeEncoder.fit(df, "cat", col("y")).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    // smoothed shares are mirror images -> equal magnitude, opposite sign
    assert(m("A") > 0 && m("B") < 0)
    assert(math.abs(m("A") + m("B")) < 1e-9, m)
    // ln((3.5/5)/(1.5/5)) = ln(7/3)
    assert(math.abs(m("A") - math.log(7.0 / 3)) < 1e-6)
  }

  test("iv terms are non-negative and sum to the screening IV") {
    val rows = WoeEncoder.fit(df, "cat", col("y")).collect()
    rows.foreach(r => assert(r.getDouble(4) >= 0)) // (dp-dn) and woe share sign
    val iv = rows.map(_.getDouble(4)).sum
    assert(iv > 0.3, s"informative split should score, got $iv")
  }

  test("uninformative category: woe ~ 0, iv ~ 0") {
    val flat = Seq(("A", true), ("A", false), ("B", true), ("B", false))
      .toDF("cat", "y")
    WoeEncoder.fit(flat, "cat", col("y")).collect().foreach { r =>
      assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0, r)
    }
  }

  test("single-class category stays finite under smoothing") {
    val skew = Seq(("A", true), ("A", true), ("B", false))
      .toDF("cat", "y")
    WoeEncoder.fit(skew, "cat", col("y")).collect().foreach { r =>
      assert(!r.getDouble(3).isInfinite && !r.getDouble(3).isNaN)
    }
  }

  test("transform maps seen categories, zeros unseen") {
    val mapping = WoeEncoder.fit(df, "cat", col("y"))
    val scored = WoeEncoder.transform(
        Seq(("A", 1L), ("B", 2L), ("C", 3L)).toDF("cat", "id"),
        mapping, "cat", "woe_cat")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("woe_cat"))
      .toMap
    assert(scored("A") > 0 && scored("B") < 0)
    assert(scored("C") == 0.0)
  }
}
