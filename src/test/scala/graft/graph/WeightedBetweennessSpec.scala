package graft.graph

import scala.util.Random

import graft.SparkSpec

/** Weighted betweenness (Betweenness.weightedBetweennessPivots) vs an
  * independent driver-side reference: weighted Floyd–Warshall
  * distances, σ by distance-order DP, pair dependencies
  * δ_s(v) = Σ_t [d(s,v)+d(v,t)=d(s,t)]·σ_sv·σ_vt/σ_st — shares no
  * code (or recursion shape) with the frame implementation's linear
  * b_k unrolling, so an algebra error in either side fails the
  * compare.
  */
class WeightedBetweennessSpec extends SparkSpec {
  import spark.implicits._

  /** Directed weighted exact reference. */
  private def brute(edges: Seq[(Long, Long, Long)], pivots: Seq[Long])
      : Map[Long, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.size
    val inf = Long.MaxValue / 4
    val w = Array.fill(n, n)(inf)
    edges.foreach { case (a, b, l) =>
      val (i, j) = (idx(a), idx(b))
      if (l < w(i)(j)) w(i)(j) = l
    }
    val d = Array.tabulate(n, n)((i, j) => if (i == j) 0L else w(i)(j))
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (d(i)(k) + d(k)(j) < d(i)(j)) d(i)(j) = d(i)(k) + d(k)(j)
    val sigma = Array.fill(n, n)(0L)
    for (s <- 0 until n) {
      sigma(s)(s) = 1
      (0 until n).filter(t => t != s && d(s)(t) < inf).sortBy(d(s)(_))
        .foreach { t =>
          sigma(s)(t) = (0 until n)
            .filter(v => w(v)(t) < inf && d(s)(v) + w(v)(t) == d(s)(t))
            .map(sigma(s)(_)).sum
        }
    }
    nodes.map { vN =>
      val v = idx(vN)
      val total = pivots.map { sN =>
        val s = idx(sN)
        if (v == s) 0.0
        else (0 until n).filter(t => t != s && t != v && d(s)(t) < inf
            && d(s)(v) + d(v)(t) == d(s)(t))
          .map(t => sigma(s)(v).toDouble * sigma(v)(t) / sigma(s)(t)).sum
      }.sum
      vN -> total
    }.toMap
  }

  private def check(edges: Seq[(Long, Long, Long)], pivots: Seq[Long],
      maxHops: Int, delta: Long): Unit = {
    val e = edges.toDF("src", "dst", "len")
    val got = Betweenness.weightedBetweennessPivots(e, "src", "dst", "len",
        pivots, maxHops = maxHops, delta = delta)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = brute(edges, pivots)
    want.foreach { case (node, bc) =>
      if (pivots.contains(node) && !got.contains(node)) ()
      else assert(math.abs(got.getOrElse(node, 0.0) - bc) < 1e-3,
        s"node $node: got ${got.get(node)}, want $bc")
    }
  }

  test("weighted path: expensive direct edge loses to the cheap detour") {
    // 0→2 direct costs 10, 0→1→2 costs 4: hop-BFS Brandes would score
    // node 1 zero; weighted Brandes must credit it
    val g = Seq((0L, 1L, 2L), (1L, 2L, 2L), (0L, 2L, 10L), (2L, 3L, 1L))
    check(g, pivots = Seq(0L), maxHops = 4, delta = 2L)
    val got = Betweenness.weightedBetweennessPivots(
        g.toDF("src", "dst", "len"), "src", "dst", "len", Seq(0L),
        maxHops = 4, delta = 2L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) >= 1.0, s"detour node got no credit: $got")
  }

  test("weighted diamond: equal-cost routes split σ") {
    // two 0→3 routes of cost 4 (via 1, via 2), then a tail
    val g = Seq((0L, 1L, 1L), (1L, 3L, 3L), (0L, 2L, 3L), (2L, 3L, 1L),
      (3L, 4L, 2L))
    check(g, pivots = Seq(0L), maxHops = 5, delta = 2L)
  }

  test("random digraph, 3 pivots, light+heavy edges across buckets") {
    val rnd = new Random(1405)
    val raw = Seq.fill(40)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong,
      (1 + rnd.nextInt(9)).toLong))
      .filter(e => e._1 != e._2)
    // dedupe parallel edges keeping the min length: the frame σ counts
    // DAG edge-multiplicity, the matrix reference can't represent it
    val g = raw.groupBy(e => (e._1, e._2)).values
      .map(_.minBy(_._3)).toSeq.sortBy(e => (e._1, e._2))
    check(g, pivots = Seq(0L, 3L, 7L), maxHops = 12, delta = 4L)
  }

  test("weighted harmonic centrality matches the driver Σ 1/d on a random digraph") {
    val rnd = new Random(77)
    val raw = Seq.fill(30)((rnd.nextInt(10).toLong, rnd.nextInt(10).toLong,
      (1 + rnd.nextInt(7)).toLong)).filter(e => e._1 != e._2)
    val g = raw.groupBy(e => (e._1, e._2)).values
      .map(_.minBy(_._3)).toSeq.sortBy(e => (e._1, e._2))
    val pivots = Seq(0L, 2L, 5L)
    val got = Betweenness.weightedHarmonicPivots(
        g.toDF("src", "dst", "len"), "src", "dst", "len", pivots,
        delta = 3L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // driver reference: Floyd–Warshall distances, Σ over pivots of 1/d
    val nodes = g.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.size
    val inf = Long.MaxValue / 4
    val d = Array.tabulate(n, n)((i, j) => if (i == j) 0L else inf)
    g.foreach { case (a, b, l) =>
      if (l < d(idx(a))(idx(b))) d(idx(a))(idx(b)) = l
    }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (d(i)(k) + d(k)(j) < d(i)(j)) d(i)(j) = d(i)(k) + d(k)(j)
    nodes.foreach { v =>
      val want = pivots.filter(p => p != v && idx.contains(p)
          && d(idx(p))(idx(v)) < inf)
        .map(p => 1.0 / d(idx(p))(idx(v))).sum
      if (want > 0)
        assert(math.abs(got.getOrElse(v, 0.0) - want) < 1e-5,
          s"node $v: got ${got.get(v)}, want $want")
      else assert(!got.contains(v) || got(v) == 0.0)
    }
  }

  test("unreachable nodes are absent; never-intermediate nodes score 0") {
    val g = Seq((0L, 1L, 5L), (1L, 2L, 5L), (7L, 8L, 1L))
    val got = Betweenness.weightedBetweennessPivots(
        g.toDF("src", "dst", "len"), "src", "dst", "len", Seq(0L),
        maxHops = 4, delta = 4L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L, 2L), s"$got")
    assert(math.abs(got(1L) - 1.0) < 1e-9 && got(2L) == 0.0, s"$got")
  }
}
