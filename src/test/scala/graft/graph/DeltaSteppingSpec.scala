package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DeltaSteppingSpec extends SparkSpec {

  /** Independent reference: binary-heap Dijkstra on the driver. */
  private def dijkstra(edges: Seq[(Long, Long, Long)],
      source: Long): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (s, es) =>
      s -> es.map(e => (e._2, e._3))
    }
    val dist = scala.collection.mutable.Map(source -> 0L)
    val pq = scala.collection.mutable.PriorityQueue((0L, source))(
      Ordering.by(-_._1))
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (d == dist(u)) {
        for ((v, l) <- adj.getOrElse(u, Nil)) {
          val nd = d + l
          if (nd < dist.getOrElse(v, Long.MaxValue)) {
            dist(v) = nd
            pq.enqueue((nd, v))
          }
        }
      }
    }
    dist.toMap
  }

  private def run(edges: Seq[(Long, Long, Long)], source: Long,
      delta: Long): Map[Long, Option[Long]] = {
    import spark.implicits._
    val e = edges.toDF("src", "dst", "len")
    val seeds = Seq(source).toDF("id")
    DeltaStepping.shortestPaths(e, "src", "dst", "len", seeds, delta)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
  }

  test("matches Dijkstra on a random weighted digraph (light+heavy mix)") {
    val rnd = new scala.util.Random(11)
    val n = 40
    val edges = (for (_ <- 1 to 160) yield
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
        1L + rnd.nextInt(40))).filter(e => e._1 != e._2).distinct
    val got = run(edges, source = 0L, delta = 8L)
    val want = dijkstra(edges, 0L)
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
    for (v <- nodes) {
      assert(got(v) == want.get(v),
        s"node $v: engine ${got(v)} vs dijkstra ${want.get(v)}")
    }
  }

  test("unreachable nodes stay null and seed distance is zero") {
    // 0 -> 1 -> 2 plus a disconnected 7 -> 8
    val edges = Seq((0L, 1L, 5L), (1L, 2L, 30L), (7L, 8L, 2L))
    val got = run(edges, source = 0L, delta = 16L)
    assert(got(0L).contains(0L) && got(1L).contains(5L)
      && got(2L).contains(35L))
    assert(got(7L).isEmpty && got(8L).isEmpty)
  }

  test("multi-seed batch equals per-seed single runs (schedule " +
      "independence of the shared bucket schedule)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val n = 30
    val edges = (for (_ <- 1 to 120) yield
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
        1L + rnd.nextInt(40))).filter(e => e._1 != e._2).distinct
    val e = edges.toDF("src", "dst", "len")
    val seeds = Seq(0L, 3L, 7L)
    val multi = DeltaStepping.shortestPathsMulti(e, "src", "dst", "len",
        seeds.toDF("id"), delta = 8L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    for (s <- seeds) {
      val single = run(edges, source = s, delta = 8L)
      for ((v, d) <- single)
        assert(multi((s, v)) == d,
          s"seed $s node $v: multi ${multi((s, v))} vs single $d")
      // same row set per seed
      assert(multi.keys.count(_._1 == s) == single.size)
    }
  }

  test("a longer light path beats a shorter heavy edge (re-entry " +
      "within a bucket)") {
    // direct heavy edge 0->3 of length 20; light chain 0->1->2->3 of
    // total 6 — the light inner loop must supersede the heavy result
    val edges = Seq((0L, 3L, 20L), (0L, 1L, 2L), (1L, 2L, 2L),
      (2L, 3L, 2L))
    val got = run(edges, source = 0L, delta = 4L)
    assert(got(3L).contains(6L), s"got ${got(3L)}")
  }
}
