package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PMI collocation mining and chi-square drift — brute-force oracles on
  * hand corpora where every count is known.
  */
class CollocationDriftSpec extends SparkSpec {
  import spark.implicits._

  test("pmiCollocations matches the hand formula on a tiny corpus") {
    // "new york" always adjacent; "the the" frequent but independent
    val docs = Seq.fill(6)("new york is big") ++
      Seq.fill(6)("the cat saw the dog the end") ++
      Seq.fill(3)("new deal in york county")
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextStats.pmiCollocations(df, "text", k = 100, minCount = 5)
      .as[(String, Long, Double)].collect()

    // independent recount
    val toks = docs.map(_.split(" ").toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val big = toks.filter(_.size >= 2)
      .flatMap(_.sliding(2).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nUni = toks.map(_.size).sum.toDouble
    val nBi = toks.map(t => math.max(t.size - 1, 0)).sum.toDouble
    def pmi(bg: String): Double = {
      val Array(a, b) = bg.split(" ")
      val v = (big(bg) / nBi) / ((uni(a) / nUni) * (uni(b) / nUni))
      BigDecimal(math.log(v))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = big.filter(_._2 >= 5).keys.map(bg => bg -> pmi(bg)).toMap
    assert(got.map(_._1).toSet == want.keySet)
    got.foreach { case (bg, cb, p) =>
      assert(cb == big(bg), s"$bg count")
      assert(p == want(bg), s"$bg pmi: got $p want ${want(bg)}")
    }
    // always-adjacent pair beats the frequent-but-independent token pair
    val byBg = got.map(r => r._1 -> r._3).toMap
    assert(byBg("new york") > byBg.getOrElse("the cat", Double.MinValue))
    // ranked on (pmi desc, bg)
    assert(got.map(r => (-r._3, r._1)).toSeq ==
      got.map(r => (-r._3, r._1)).toSeq.sorted)
  }

  test("pmiCollocations honors minCount and k") {
    val df = (Seq.fill(4)("rare pair x") ++ Seq.fill(9)("common pair y"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val bgs = TextStats.pmiCollocations(df, "text", k = 2, minCount = 5)
      .as[(String, Long, Double)].collect().map(_._1)
    assert(bgs.length == 2)
    assert(!bgs.contains("rare pair"), "minCount=5 must drop the 4-count pair")
  }

  test("distributionDrift: proportional populations give zero chi2") {
    val a = Seq.fill(10)(1L) ++ Seq.fill(30)(2L)
    val b = Seq.fill(20)(1L) ++ Seq.fill(60)(2L) // same proportions, 2x size
    val out = TextStats.distributionDrift(
      a.toDF("v"), b.toDF("v"), col("v"))
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(out.forall(_._6 == 0.0), s"chi2 must vanish: ${out.toSeq}")
  }

  test("distributionDrift matches the hand-computed 2x2 table") {
    val a = Seq.fill(10)(0L) ++ Seq.fill(30)(1L)
    val b = Seq.fill(20)(0L) ++ Seq.fill(20)(1L)
    val out = TextStats.distributionDrift(
      a.toDF("v"), b.toDF("v"), col("v"))
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // bucket 0: col total 30, na=40, nb=40, N=80 -> exp 15/15
    assert(out(0L) == ((0L, 10L, 20L, 15.0, 15.0,
      BigDecimal(25.0 / 15 + 25.0 / 15)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // bucket 1: col total 50 -> exp 25/25, chi2 = 1 + 1
    assert(out(1L) == ((1L, 30L, 20L, 25.0, 25.0, 2.0)))
  }

  test("jsDivergence: identical distributions give zero everywhere") {
    val a = Seq.fill(10)(0L) ++ Seq.fill(30)(1L)
    val b = Seq.fill(20)(0L) ++ Seq.fill(60)(1L) // same proportions
    val out = TextStats.jsDivergence(a.toDF("v"), b.toDF("v"), col("v"))
      .as[(Long, Long, Long, Double)].collect()
    assert(out.forall(_._4 == 0.0), s"JS must vanish: ${out.toSeq}")
  }

  test("jsDivergence matches the hand formula and is symmetric") {
    val a = Seq.fill(10)(0L) ++ Seq.fill(30)(1L)
    val b = Seq.fill(20)(0L) ++ Seq.fill(20)(1L)
    def js(p: Double, q: Double): Double = {
      val m = (p + q) * 0.5
      val t = (if (p > 0) p * math.log(p / m) else 0.0) * 0.5 +
        (if (q > 0) q * math.log(q / m) else 0.0) * 0.5
      BigDecimal(t).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val out = TextStats.jsDivergence(a.toDF("v"), b.toDF("v"), col("v"))
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(out(0L) == js(10.0 / 40, 20.0 / 40))
    assert(out(1L) == js(30.0 / 40, 20.0 / 40))
    val sym = TextStats.jsDivergence(b.toDF("v"), a.toDF("v"), col("v"))
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(out == sym)
  }

  test("ksStatistic matches the hand CDF walk; ties take the smallest bucket") {
    val a = Seq.fill(10)(0L) ++ Seq.fill(30)(1L) ++ Seq.fill(10)(2L)
    val b = Seq.fill(20)(0L) ++ Seq.fill(20)(1L) ++ Seq.fill(10)(2L)
    // CDF_a: .2, .8, 1.0  CDF_b: .4, .8, 1.0 → sup .2 at bucket 0
    val r = TextStats.ksStatistic(a.toDF("v"), b.toDF("v"), col("v"))
      .as[(Double, Long, Long, Long)].collect().head
    assert(r == ((0.2, 0L, 50L, 50L)))
  }

  test("ksStatistic: identical distributions give 0; disjoint give 1") {
    val a = Seq.fill(10)(0L) ++ Seq.fill(30)(1L)
    val b = Seq.fill(20)(0L) ++ Seq.fill(60)(1L)
    assert(TextStats.ksStatistic(a.toDF("v"), b.toDF("v"), col("v"))
      .collect().head.getDouble(0) == 0.0)
    val c = Seq.fill(25)(0L); val d = Seq.fill(40)(5L)
    assert(TextStats.ksStatistic(c.toDF("v"), d.toDF("v"), col("v"))
      .collect().head.getDouble(0) == 1.0)
  }

  test("jsDivergence: disjoint supports sum to ln 2") {
    val a = Seq.fill(25)(0L)
    val b = Seq.fill(40)(1L)
    val total = TextStats.jsDivergence(a.toDF("v"), b.toDF("v"), col("v"))
      .as[(Long, Long, Long, Double)].collect().map(_._4).sum
    // per-bucket 1e-6 rounding → the 2-bucket sum can be off by 1e-6
    assert(total ~== (math.log(2.0), 2e-6), s"disjoint JS = $total")
  }
}
