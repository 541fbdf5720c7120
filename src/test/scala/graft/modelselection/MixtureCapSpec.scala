package graft.modelselection

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Temperature mixture rates and the per-group bounded-heap cap. */
class MixtureCapSpec extends SparkSpec {
  import spark.implicits._

  test("temperatureMixtureRates matches the closed form and its limits") {
    val df = Seq(("en", 8000L), ("de", 1000L), ("fr", 1000L))
      .flatMap { case (g, n) => Seq.fill(4)((g, n / 4)) }
      .toDF("lang", "n")
    val got = Splits.temperatureMixtureRates(df, "lang", "n", alpha = 0.5)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap

    val z = math.sqrt(8000.0) + math.sqrt(1000.0) + math.sqrt(1000.0)
    assert(got("en")._2 == 8000L)
    assert(got("en")._3 ~== (0.8, 1e-12))
    assert(got("en")._4 ~== (math.sqrt(8000.0) / z, 1e-12))
    assert(got("de")._5 ~== ((math.sqrt(1000.0) / z) / 0.1, 1e-12))
    // alpha < 1 up-weights low-resource: boost > 1 for small, < 1 for big
    assert(got("de")._5 > 1.0 && got("en")._5 < 1.0)
    // q sums to 1
    assert(got.values.map(_._4).sum ~== (1.0, 1e-12))
    // alpha = 1 is the natural distribution
    val nat = Splits.temperatureMixtureRates(df, "lang", "n", alpha = 1.0)
      .as[(String, Long, Double, Double, Double)].collect()
    nat.foreach(r => assert(r._4 ~== (r._3, 1e-12)))
  }

  test("capPerGroup keeps the top-cap ids per group, ties by id") {
    val rows = for (g <- Seq("a", "b"); i <- 0 until 30)
      yield (g, g.hashCode.toLong * 100 + i, (i % 10).toDouble)
    val got = Splits.capPerGroup(rows.toDF("grp", "id", "s"),
        "grp", "id", col("s"), cap = 5)
      .as[(String, Int, Long, Double)].collect()
    assert(got.length == 10)
    got.groupBy(_._1).foreach { case (g, rs) =>
      val want = rows.filter(_._1 == g)
        .sortBy { case (_, id, s) => (-s, id) }.take(5)
        .map { case (_, id, s) => (id, s) }
      assert(rs.sortBy(_._2).map(r => (r._3, r._4)).toSeq == want.toSeq,
        s"group $g")
      assert(rs.map(_._2).sorted.toSeq == (1 to 5))
    }
  }

  test("capPerGroup leaves small groups whole") {
    val got = Splits.capPerGroup(
        Seq(("g", 1L, 3.0), ("g", 2L, 1.0)).toDF("grp", "id", "s"),
        "grp", "id", col("s"), cap = 10)
      .as[(String, Int, Long, Double)].collect()
    assert(got.map(r => (r._2, r._3)).sorted.toSeq == Seq((1, 1L), (2, 2L)))
  }
}
