package graft.relational

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DDSketch-style quantile sketch: shard-merge ≡ whole-sketch
  * (bit-identical frames, not just close estimates), partition
  * independence, and the α-relative-error guarantee vs the true order
  * statistic on a heavy-tailed sample.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val alpha = 0.02
  // heavy-tailed positive values across two groups, fixed seed
  private val rnd = new Random(42)
  private val data: Seq[(String, Double)] =
    (1 to 4000).map { i =>
      (if (i % 3 == 0) "a" else "b", math.exp(rnd.nextGaussian() * 2.0 + 3.0))
    }

  private def sk(rows: Seq[(String, Double)]) =
    Sketches.quantileSketch(rows.toDF("g", "v"), col("g"), col("v"), alpha)

  test("shard-merge equals the whole-corpus sketch, frame for frame") {
    val (l, r) = data.splitAt(1234)
    val merged = Sketches.quantileSketchMerge(sk(l), sk(r))
      .as[(String, Long, Long)].collect().sorted.toSeq
    val whole = sk(data).as[(String, Long, Long)].collect().sorted.toSeq
    assert(merged == whole)
    // and a three-way unbalanced merge tree lands on the same frame
    val (x, yz) = data.splitAt(100)
    val (y, z) = yz.splitAt(3000)
    val tree = Sketches.quantileSketchMerge(
      Sketches.quantileSketchMerge(sk(x), sk(y)), sk(z))
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(tree == whole)
  }

  test("sketch is partition-independent") {
    val df = data.toDF("g", "v")
    val s1 = Sketches.quantileSketch(df.repartition(1), col("g"), col("v"),
      alpha).as[(String, Long, Long)].collect().sorted.toSeq
    val s7 = Sketches.quantileSketch(df.repartition(7), col("g"), col("v"),
      alpha).as[(String, Long, Long)].collect().sorted.toSeq
    assert(s1 == s7)
  }

  test("every estimate is within alpha of the true order statistic") {
    val ps = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99)
    val est = Sketches.quantileSketchEstimate(sk(data), ps, alpha)
      .as[(String, Double, Double)].collect()
      .map { case (g, p, e) => (g, p) -> e }.toMap
    val byG = data.groupBy(_._1).map { case (g, rows) =>
      g -> rows.map(_._2).sorted.toIndexedSeq
    }
    for { (g, sorted) <- byG; p <- ps } {
      val r = math.floor(p * (sorted.size - 1)).toLong + 1
      val exact = sorted((r - 1).toInt)
      val e = est((g, p))
      assert(math.abs(e - exact) <= alpha * exact + 1e-9,
        s"($g, $p): est $e vs exact $exact")
    }
  }

  test("state is bounded by the log range, not the row count") {
    val n = sk(data).count()
    // values span e^{3±~8} ≈ 7 decades; ln-range / ln(gamma) buckets
    val maxBuckets = (math.log(data.map(_._2).max / data.map(_._2).min)
      / math.log(Sketches.ddGamma(alpha))).toLong + 2
    assert(n <= 2 * maxBuckets, s"$n sketch rows for 2 groups")
    // 10x the data, same bucket bound
    val big = data ++ data ++ data ++ data ++ data ++
      data ++ data ++ data ++ data ++ data
    assert(sk(big).count() == n)
  }
}
