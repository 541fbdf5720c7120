package graft.llmdata

import scala.util.Random

import graft.SparkSpec

/** k-center greedy vs a driver brute-force farthest-first replay:
  * identical selection trajectory (quantized-distance argmax, min-id
  * ties), non-increasing radius, and the Gonzalez property that every
  * point sits within the final radius of some selected center.
  */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  private def sq(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }

  private def r6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def brute(pts: Seq[(Long, Seq[Double])], k: Int): Seq[(Int, Long, Double)] = {
    val seed = pts.minBy(_._1)
    var mind = pts.map { case (id, v) => id -> sq(v, seed._2) }.toMap
    val byId = pts.toMap
    var out = Vector((0, seed._1, 0.0))
    for (step <- 1 until k) {
      val (cid, d) = mind.toSeq.minBy { case (id, d) => (-r6(d), id) }
      out :+= ((step, cid, r6(d)))
      if (step < k - 1)
        mind = mind.map { case (id, p) => id -> math.min(p, sq(byId(id), byId(cid))) }
    }
    out
  }

  private def run(pts: Seq[(Long, Seq[Double])], k: Int): Seq[(Int, Long, Double)] =
    Coreset.kCenterGreedy(pts.toDF("vec_id", "v"), "v", "vec_id", k)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq

  test("trajectory matches the driver replay on random point sets") {
    val rnd = new Random(5)
    val pts = (0L until 60L).map(i => i -> Seq.fill(4)(rnd.nextDouble() * 10))
    val got = run(pts, 6)
    assert(got == brute(pts, 6))
  }

  test("radius is non-increasing after step 1 and covers the corpus") {
    val rnd = new Random(9)
    val pts = (0L until 80L).map(i => i -> Seq.fill(3)(rnd.nextGaussian()))
    val got = run(pts, 8)
    val radii = got.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b })
    // Gonzalez cover: the last reported radius is the max min-dist
    // BEFORE adding the final center, so with all k centers in, every
    // remaining point sits within that radius of some center
    val centers = got.map(_._2).toSet
    val cover = pts.filterNot(p => centers(p._1))
      .map(p => got.map(c => sq(p._2, pts(c._2.toInt)._2)).min)
      .max
    assert(cover <= got.last._3 + 1e-9)
  }

  test("two well-separated blobs: second center lands in the far blob") {
    val a = (0L until 10L).map(i => i -> Seq(0.0 + i * 0.01, 0.0))
    val b = (10L until 20L).map(i => i -> Seq(100.0 + i * 0.01, 0.0))
    val got = run(a ++ b, 3)
    assert(got.head == ((0, 0L, 0.0)))
    assert(got(1)._2 >= 10L) // farthest-first jumps to the distant blob
    assert(got == brute(a ++ b, 3))
  }

  test("duplicate points (zero distances) tie-break toward smaller id") {
    val pts = Seq(1L -> Seq(0.0), 2L -> Seq(0.0), 3L -> Seq(5.0), 4L -> Seq(5.0))
    assert(run(pts, 4) == brute(pts, 4))
  }

  test("k = 1 returns just the seed") {
    val pts = Seq(7L -> Seq(1.0, 2.0), 3L -> Seq(0.0, 0.0))
    assert(run(pts, 1) == Seq((0, 3L, 0.0)))
  }
}
