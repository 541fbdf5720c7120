package graft.metrics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Uplift table semantics: a score that ranks persuadables first shows
  * decreasing uplift by decile; a null treatment shows ~zero uplift;
  * empty cells stay null. */
class UpliftSpec extends SparkSpec {

  import spark.implicits._

  test("injected heterogeneous effect shows up in the top deciles") {
    val rnd = new scala.util.Random(23)
    // score = true persuadability; treated converts with p = 0.1+0.6·s,
    // control with p = 0.1
    val rows = (1 to 4000).map { i =>
      val s = (i % 100) / 100.0
      val t = i % 2 == 0
      val p = if (t) 0.1 + 0.6 * s else 0.1
      (s, t, rnd.nextDouble() < p)
    }
    val got = Uplift.upliftByDecile(rows.toDF("s", "t", "y"), "s",
      col("t"), col("y"), nBins = 5)
      .orderBy("decile").collect()
    val uplift = got.map(_.getAs[Double]("uplift"))
    assert(uplift.head > 0.35, s"top decile uplift ${uplift.head}")
    assert(uplift.head > uplift.last + 0.2, uplift.toSeq)
  }

  test("null treatment effect yields near-zero uplift everywhere") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 4000).map { i =>
      ((i % 100) / 100.0, i % 2 == 0, rnd.nextDouble() < 0.3)
    }
    val got = Uplift.upliftByDecile(rows.toDF("s", "t", "y"), "s",
      col("t"), col("y"), nBins = 5).collect()
    assert(got.forall(r => math.abs(r.getAs[Double]("uplift")) < 0.08))
  }

  test("an all-treated decile keeps control rate null, not fabricated") {
    val rows = (1 to 100).map(i => (i.toDouble, true, i % 3 == 0)) ++
      Seq((0.0, false, false))
    val got = Uplift.upliftByDecile(rows.toDF("s", "t", "y"), "s",
      col("t"), col("y"), nBins = 2)
      .orderBy("decile").collect()
    assert(got.head.getAs[Long]("n_c") === 0L)
    assert(got.head.isNullAt(got.head.fieldIndex("rate_c")))
    assert(got.head.isNullAt(got.head.fieldIndex("uplift")))
  }
}
