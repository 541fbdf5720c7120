package graft.graph

import graft.SparkSpec

class BetweennessSpec extends SparkSpec {

  /** Independent exact reference: Floyd-Warshall distances, σ path
    * counts by distance DP, pair dependencies
    * δ_s(v) = Σ_t σ_sv·σ_vt / σ_st over shortest paths through v —
    * shares no code with the frame implementation.
    */
  private def brute(edges: Seq[(Long, Long)], pivots: Seq[Long])
      : Map[Long, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.size
    val inf = Int.MaxValue / 4
    val d = Array.fill(n, n)(inf)
    nodes.indices.foreach(i => d(i)(i) = 0)
    val adj = Array.fill(n, n)(false)
    edges.foreach { case (a, b) =>
      val (i, j) = (idx(a), idx(b))
      adj(i)(j) = true; adj(j)(i) = true
      d(i)(j) = 1; d(j)(i) = 1
    }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (d(i)(k) + d(k)(j) < d(i)(j)) d(i)(j) = d(i)(k) + d(k)(j)
    // σ(s, t): process targets in distance order
    val sigma = Array.fill(n, n)(0L)
    for (s <- 0 until n) {
      sigma(s)(s) = 1
      (0 until n).filter(d(s)(_) < inf).sortBy(d(s)(_)).foreach { w =>
        if (w != s)
          sigma(s)(w) = (0 until n)
            .filter(v => adj(v)(w) && d(s)(v) + 1 == d(s)(w))
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

  private def check(edges: Seq[(Long, Long)], pivots: Seq[Long],
      maxDepth: Int): Unit = {
    import spark.implicits._
    val sym = EdgeFrames.symmetrizedWeighted(edges.toDF("id_a", "id_b"))
    val got = Betweenness.betweennessPivots(sym, pivots, maxDepth)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = brute(edges, pivots)
    want.foreach { case (node, bc) =>
      if (pivots.contains(node) && !got.contains(node)) ()
      else assert(math.abs(got.getOrElse(node, 0.0) - bc) < 1e-4,
        s"node $node: got ${got.get(node)}, want $bc (edges $edges)")
    }
  }

  test("matches exact Brandes on a path (middle nodes carry the load)") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    check(path, pivots = Seq(0L, 1L, 2L, 3L, 4L), maxDepth = 5)
  }

  test("matches exact Brandes on a star + bridge") {
    // star center 0 with leaves 1-3, bridge 0-4-5: 0 and 4 dominate
    val g = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (4L, 5L))
    check(g, pivots = Seq(1L, 2L, 5L), maxDepth = 4)
  }

  test("matches exact Brandes where multiple shortest paths split σ") {
    // diamond: 0-1-3, 0-2-3 (two shortest 0→3 paths), tail 3-4
    val g = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    check(g, pivots = Seq(0L, 4L), maxDepth = 4)
  }

  test("pivot subset sums only the sampled dependencies") {
    val path = Seq((0L, 1L), (1L, 2L))
    import spark.implicits._
    val sym = EdgeFrames.symmetrizedWeighted(path.toDF("id_a", "id_b"))
    val got = Betweenness.betweennessPivots(sym, Seq(0L), maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // from pivot 0 only: δ_0(1) = 1 (the 0→2 path), δ_0(2) = 0
    assert(math.abs(got(1L) - 1.0) < 1e-9 && got(2L) == 0.0, s"$got")
  }
}
