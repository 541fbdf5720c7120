package graft.modelselection

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NeymanSpec extends SparkSpec {
  import spark.implicits._

  /** strata with controlled per-stratum spread: values mn ± spread */
  private def corpus(specs: Seq[(String, Int, Double)]): org.apache.spark.sql.DataFrame =
    specs.flatMap { case (name, n, spread) =>
      (0 until n).map(i =>
        (name, s"$name-$i", 1000.0 + (if (i % 2 == 0) spread else -spread)))
    }.toDF("stratum", "id", "v")

  test("allocation totals k exactly and follows N_h·σ_h") {
    // equal sizes, σ ratio 1:3 → allocation ratio 1:3 (up to rounding)
    val df = corpus(Seq(("lo", 200, 10.0), ("hi", 200, 30.0)))
    val a = Splits.neymanAllocation(df, "stratum", "v", k = 100)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(a.values.sum == 100)
    assert(a("hi") == 75 && a("lo") == 25)
  }

  test("largest-remainder rounding lands Σ = k with fractional shares") {
    val df = corpus(Seq(("a", 100, 10.0), ("b", 100, 13.0), ("c", 100, 17.0)))
    val a = Splits.neymanAllocation(df, "stratum", "v", k = 97)
      .collect().map(r => r.getLong(3))
    assert(a.sum == 97)
  }

  test("saturated stratum is capped at its row count") {
    // tiny stratum with enormous spread would be over-allocated
    val df = corpus(Seq(("tiny", 5, 1000.0), ("big", 500, 1.0)))
    val a = Splits.neymanAllocation(df, "stratum", "v", k = 100)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(a("tiny") == 5)
  }

  test("zero-variance corpus falls back to proportional allocation") {
    val df = corpus(Seq(("a", 300, 0.0), ("b", 100, 0.0)))
    val a = Splits.neymanAllocation(df, "stratum", "v", k = 40)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(a == Map("a" -> 30L, "b" -> 10L))
  }

  test("empty input yields an empty sample, not an NPE") {
    val empty = corpus(Nil)
    assert(Splits.neymanSample(empty, "stratum", "id", "v", k = 10)
      .count() == 0)
  }

  test("sample honors the allocation per stratum, deterministically, as a subset") {
    val df = corpus(Seq(("lo", 200, 10.0), ("hi", 200, 30.0)))
    val alloc = Splits.neymanAllocation(df, "stratum", "v", k = 60)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val s1 = Splits.neymanSample(df, "stratum", "id", "v", k = 60)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val s2 = Splits.neymanSample(df, "stratum", "id", "v", k = 60)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(s1.sorted.sameElements(s2.sorted))
    val perStratum = s1.groupBy(_._1).map { case (k2, v) => k2 -> v.length.toLong }
    assert(perStratum == alloc.filter(_._2 > 0))
    val ids = df.select("id").as[String].collect().toSet
    assert(s1.forall(t => ids.contains(t._3)))
    assert(s1.map(_._3).distinct.length == s1.length)
  }
}
