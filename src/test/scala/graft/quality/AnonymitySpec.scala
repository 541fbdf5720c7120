package graft.quality

import org.apache.spark.sql.Row

import graft.SparkSpec

class AnonymitySpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // class (A, 1): 3 rows, 2 distinct sensitive values
    ("A", 1, "s1"), ("A", 1, "s1"), ("A", 1, "s2"),
    // class (A, 2): 1 row — violates k=2 and l=2
    ("A", 2, "s1"),
    // class (B, 1): 2 rows, sensitive-uniform — violates l=2 only
    ("B", 1, "s3"), ("B", 1, "s3"))

  private def rep(k: Long, l: Long = 2): Row =
    Anonymity.kAnonymityReport(rows.toDF("qa", "qb", "s"),
      Seq("qa", "qb"), "s", k, l).collect().head

  test("class sizes, violations and risk fractions") {
    val r = rep(k = 2)
    assert(r.getAs[Long]("n_rows") == 6)
    assert(r.getAs[Long]("n_classes") == 3)
    assert(r.getAs[Long]("k_min") == 1)
    assert(r.getAs[Long]("n_violating_k") == 1)
    assert(r.getAs[Long]("rows_at_risk") == 1)
    assert(math.abs(r.getAs[Double]("frac_at_risk") - 1.0 / 6) < 1e-6)
    assert(r.getAs[Long]("l_min") == 1)
    assert(r.getAs[Long]("n_violating_l") == 2)
  }

  test("k = 1 is always satisfied; large k flags everything") {
    val ok = rep(k = 1)
    assert(ok.getAs[Long]("n_violating_k") == 0
      && ok.getAs[Long]("rows_at_risk") == 0)
    val bad = rep(k = 100)
    assert(bad.getAs[Long]("n_violating_k") == 3
      && bad.getAs[Long]("rows_at_risk") == 6
      && bad.getAs[Double]("frac_at_risk") == 1.0)
  }

  test("null QI values form their own (linkable) class") {
    val withNull = (rows :+ ((null: String), 1, "s9"))
      .toDF("qa", "qb", "s")
    val r = Anonymity.kAnonymityReport(withNull, Seq("qa", "qb"), "s", 2)
      .collect().head
    assert(r.getAs[Long]("n_classes") == 4)
    assert(r.getAs[Long]("n_violating_k") == 2) // (A,2) and (null,1)
  }
}
