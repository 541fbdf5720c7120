package graft.relational

import graft.SparkSpec

/** Association-rule metrics against hand computation, the support
  * floor, and the independence baseline (lift ≈ 1). */
class AssociationSpec extends SparkSpec {

  import spark.implicits._

  test("support/confidence/lift match the hand computation") {
    // 4 baskets: {a,b} ×3, {a} ×1 → sup_a=4, sup_b=3, sup_ab=3
    val rows = Seq((1, "a"), (1, "b"), (2, "a"), (2, "b"),
      (3, "a"), (3, "b"), (4, "a"))
    val got = Association.pairRules(rows.toDF("bk", "it"), "bk", "it",
      minSupport = 2, k = 5).head()
    assert(got.getAs[String]("id_a") === "a")
    assert(got.getAs[Long]("support_pair") === 3L)
    assert(got.getAs[Double]("confidence_ab") === 0.75) // 3/4
    assert(got.getAs[Double]("confidence_ba") === 1.0)  // 3/3
    assert(got.getAs[Double]("lift") === 1.0)           // 3·4/(4·3)
  }

  test("the support floor prunes and duplicates within a basket collapse") {
    val rows = Seq((1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "z"))
    val got = Association.pairRules(rows.toDF("bk", "it"), "bk", "it",
      minSupport = 2, k = 5)
    assert(got.count() === 0L) // every pair has support 1
    val loose = Association.pairRules(rows.toDF("bk", "it"), "bk", "it",
      minSupport = 1, k = 5)
    // ("x","x") never appears despite the duplicate row
    assert(loose.collect().forall(r =>
      r.getAs[String]("id_a") != r.getAs[String]("id_b")))
  }

  test("independent items score lift ~1, dependent pairs above") {
    // b always with a; c in half the a-baskets and half the others
    val rows = (1 to 40).flatMap { i =>
      val base = if (i <= 20) Seq((i, "a"), (i, "b")) else Seq((i, "d"))
      base ++ (if (i % 2 == 0) Seq((i, "c")) else Nil)
    }
    val got = Association.pairRules(rows.toDF("bk", "it"), "bk", "it",
        minSupport = 2, k = 10)
      .collect().map(r => (r.getAs[String]("id_a"),
        r.getAs[String]("id_b")) -> r.getAs[Double]("lift")).toMap
    assert(got(("a", "b")) === 2.0) // 20·40/(20·20)
    assert(got(("a", "c")) === 1.0) // independent
  }
}
