package graft.metrics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FairnessSpec extends SparkSpec {
  import spark.implicits._

  // (group, label, pred)
  private val rows = Seq(
    ("a", true, true), ("a", true, false), ("a", false, false),
    ("a", false, true),
    ("b", true, true), ("b", true, true), ("b", false, false),
    ("b", false, false), ("b", false, false))

  private def slices = Fairness.sliceReport(
    rows.toDF("g", "y", "p"), "g", col("y"), col("p"))

  test("per-group confusion rates") {
    val m = slices.collect().map(r => r.getString(0) -> r).toMap
    val a = m("a")
    assert(a.getAs[Long]("n") == 4)
    assert(a.getAs[Double]("base_rate") == 0.5)
    assert(a.getAs[Double]("selection_rate") == 0.5)
    assert(a.getAs[Double]("accuracy") == 0.5)
    assert(a.getAs[Double]("tpr") == 0.5)
    assert(a.getAs[Double]("fpr") == 0.5)
    val b = m("b")
    assert(b.getAs[Double]("tpr") == 1.0 && b.getAs[Double]("fpr") == 0.0)
    assert(b.getAs[Double]("accuracy") == 1.0)
  }

  test("empty cells stay null, never fabricated") {
    val df = Seq(("a", true, true), ("a", true, false))
      .toDF("g", "y", "p")
    val r = Fairness.sliceReport(df, "g", col("y"), col("p"))
      .collect().head
    assert(r.isNullAt(r.fieldIndex("fpr"))) // no negatives in the group
    assert(r.getAs[Double]("tpr") == 0.5)
  }

  test("disparity: four-fifths ratio + equalized-odds gaps") {
    val d = Fairness.disparity(slices).collect().head
    // selection rates: a 0.5, b 0.4 -> ratio 0.8
    assert(d.getAs[Double]("disparate_impact") == 0.8)
    assert(d.getAs[Double]("tpr_gap") == 0.5)
    assert(d.getAs[Double]("fpr_gap") == 0.5)
  }
}
