package graft.llmdata

import scala.util.Random

import graft.SparkSpec

/** Margin mining vs a driver replay of the ratio-margin arithmetic:
  * hubness normalization must demote a vector close to everything,
  * mutual-best must be symmetric, and the mined set must match the
  * brute replay on random candidate sets.
  */
class BitextSpec extends SparkSpec {
  import spark.implicits._

  private def r6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def brute(pairs: Seq[(Long, Long, Double)], k: Int,
      thr: Double): Seq[(Long, Long, Double, Double)] = {
    def topkMean(by: Map[Long, Seq[(Long, Double)]]): Map[Long, Double] =
      by.map { case (id, cs) =>
        val top = cs.sortBy { case (o, c) => (-c, o) }.take(k).map(_._2)
        id -> top.sum / math.min(k, cs.size)
      }
    val ma = topkMean(pairs.groupBy(_._1).map { case (a, ps) =>
      a -> ps.map(p => (p._2, p._3)) })
    val mb = topkMean(pairs.groupBy(_._2).map { case (b, ps) =>
      b -> ps.map(p => (p._1, p._3)) })
    val m = pairs.map { case (a, b, c) =>
      (a, b, c, c / ((ma(a) + mb(b)) / 2.0)) }
    val fwd = m.groupBy(_._1).map { case (_, ps) =>
      ps.minBy(p => (-r6(p._4), p._2)) }.toSet
    val bwd = m.groupBy(_._2).map { case (_, ps) =>
      ps.minBy(p => (-r6(p._4), p._1)) }.toSet
    (fwd intersect bwd).toSeq
      .filter(p => r6(p._4) >= thr)
      .map(p => (p._1, p._2, r6(p._3), r6(p._4)))
      .sortBy(p => (p._1, p._2))
  }

  private def run(pairs: Seq[(Long, Long, Double)], k: Int,
      thr: Double): Seq[(Long, Long, Double, Double)] =
    Bitext.mineMutualBest(pairs.toDF("id_a", "id_b", "cos"), k, thr)
      .orderBy("src_id", "tgt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq

  test("random candidate sets match the driver replay") {
    val rnd = new Random(3)
    for (_ <- 1 to 3) {
      val pairs = for (a <- 0L until 12L; b <- 100L until 110L)
        yield (a, b, rnd.nextDouble())
      assert(run(pairs, 4, 1.0) == brute(pairs, 4, 1.0))
    }
  }

  test("hubness normalization demotes a universally-close hub") {
    // hub 100 has cos 0.9 to everyone; 101 matches only a=1 (0.8)
    val pairs = (0L until 6L).map(a => (a, 100L, 0.9)) ++
      (0L until 6L).map(a => (a, 101L, if (a == 1L) 0.8 else 0.1))
    val mined = run(pairs, 3, 1.0)
    // the hub's margins hover at 1 (cos ≈ its top-k mean); the unique
    // (1,101) match has margin well above — it must be mined
    assert(mined.exists(p => p._1 == 1L && p._2 == 101L))
    assert(mined == brute(pairs, 3, 1.0))
  }

  test("mutual-best keeps only symmetric argmaxes") {
    // a=0 prefers b=100, but b=100 prefers a=1 → (0,100) not mined
    val pairs = Seq((0L, 100L, 0.7), (1L, 100L, 0.9), (0L, 101L, 0.6),
      (1L, 101L, 0.2))
    val got = run(pairs, 2, 0.0)
    assert(got == brute(pairs, 2, 0.0))
    assert(!got.exists(p => p._1 == 0L && p._2 == 100L))
  }

  test("candidate sets smaller than k divide by the true count") {
    val pairs = Seq((0L, 100L, 0.9), (0L, 101L, 0.5), (1L, 100L, 0.4))
    assert(run(pairs, 4, 0.0) == brute(pairs, 4, 0.0))
  }

  test("LSH candidates are a subset of brute force with identical cosines") {
    val rnd = new Random(17)
    def mk(n: Int, off: Long) = (0 until n).map(i =>
      (off + i, Seq.fill(16)(rnd.nextGaussian())))
    val src = mk(20, 0L).toDF("vec_id", "embedding")
    val tgt = mk(15, 100L).toDF("vec_id", "embedding")
    val brute = Bitext.candidateCosines(src, tgt, "embedding", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Bitext.lshCandidateCosines(src, tgt, "embedding", "vec_id",
        nPlanes = 3, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(lsh.nonEmpty && lsh.size < brute.size)
    lsh.foreach { case (k, c) => assert(math.abs(c - brute(k)) < 1e-12) }
  }

  test("threshold filters on the rounded margin") {
    val pairs = for (a <- 0L until 5L; b <- 100L until 105L)
      yield (a, b, if (a + 100 == b) 0.95 else 0.3)
    val all = run(pairs, 3, 0.0)
    val high = run(pairs, 3, all.map(_._4).max + 0.001)
    assert(all.nonEmpty && high.isEmpty)
  }
}
