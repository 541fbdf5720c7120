package graft.metrics

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("weights follow Poisson(1): frequencies match the pmf, mean ~ 1") {
    val n = 50000
    val w = spark.range(n)
      .select(Bootstrap.poissonWeight(col("id"), lit(0), "t").as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pmf = Seq(0.3679, 0.3679, 0.1839, 0.0613)
    pmf.zipWithIndex.foreach { case (p, k) =>
      val f = w.getOrElse(k, 0L).toDouble / n
      assert(math.abs(f - p) < 0.01, s"P(K=$k): $f vs $p")
    }
    val mean = w.map { case (k, c) => k.toLong * c }.sum.toDouble / n
    assert(math.abs(mean - 1.0) < 0.02, s"mean $mean")
  }

  test("replicas draw independent weights (distinct hashes per replica)") {
    val w01 = spark.range(2000).select(
        Bootstrap.poissonWeight(col("id"), lit(0), "t").as("a"),
        Bootstrap.poissonWeight(col("id"), lit(1), "t").as("b"))
      .agg(corr(col("a").cast("double"), col("b").cast("double")))
      .collect()(0).getDouble(0)
    assert(math.abs(w01) < 0.06, s"replica correlation $w01")
  }

  test("CI brackets the true mean at roughly nominal coverage") {
    // 40 groups of 200 N(100, 10) values: the 95% percentile-bootstrap
    // interval should contain 100 for the vast majority of groups
    val rnd = new Random(23)
    val df = (for (g <- 0 until 40; i <- 0 until 200)
      yield (s"g$g", g * 200L + i, 100.0 + rnd.nextGaussian() * 10.0))
      .toDF("grp", "id", "v")
    val ci = Bootstrap.bootstrapCI(df, "grp", "id", "v", b = 50)
      .collect().map(r => (r.getString(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(ci.length == 40)
    ci.foreach { case (g, m, lo, hi, nr) =>
      assert(lo <= hi, s"$g: lo > hi")
      assert(nr == 50L, s"$g: lost replicas")
      assert(lo <= m && m <= hi, s"$g: point estimate $m outside [$lo, $hi]")
    }
    val covered = ci.count { case (_, _, lo, hi, _) => lo <= 100.0 && 100.0 <= hi }
    assert(covered >= 34, s"only $covered/40 intervals cover the true mean")
    // and the intervals are non-degenerate: width ~ 2*1.96*10/sqrt(200)
    val widths = ci.map { case (_, _, lo, hi, _) => hi - lo }
    assert(widths.min > 0.5 && widths.max < 10.0, s"widths ${widths.min}..${widths.max}")
  }

  test("deterministic: same salt reproduces the identical intervals") {
    val df = (0 until 500).map(i => ("g", i.toLong, (i % 37).toDouble))
      .toDF("grp", "id", "v")
    val a = Bootstrap.bootstrapCI(df, "grp", "id", "v", b = 30).collect().toSeq
    val b = Bootstrap.bootstrapCI(df, "grp", "id", "v", b = 30).collect().toSeq
    assert(a == b)
  }
}
