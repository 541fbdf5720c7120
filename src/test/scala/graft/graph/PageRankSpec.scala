package graft.graph

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long, Long)], iters: Int = 20) =
    PageRank.pageRank(edges.toDF("s", "t", "w"), "s", "t", "w",
        iters = iters)
      .as[(Long, Double)].collect().toMap

  test("probability mass is conserved (sums to 1), incl. dangling nodes") {
    // node 3 is dangling (never a src)
    val r = ranks(Seq((1L, 2L, 1L), (2L, 3L, 1L), (2L, 1L, 1L), (3L, -1L, 0L))
      .filter(_._3 > 0))
    assert(math.abs(r.values.sum - 1.0) < 1e-6, r)
  }

  test("a symmetric cycle yields uniform ranks") {
    val r = ranks(Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L)))
    assert(r.values.toSeq.distinct.size == 1, r)
    assert(math.abs(r(1L) - 1.0 / 3) < 1e-6)
  }

  test("the node everyone links to outranks the others") {
    val r = ranks(Seq((1L, 9L, 1L), (2L, 9L, 1L), (3L, 9L, 1L),
      (9L, 1L, 1L), (9L, 2L, 1L), (9L, 3L, 1L)))
    assert(r(9L) > r(1L) && r(9L) > r(2L) && r(9L) > r(3L), r)
  }

  test("edge weights steer rank: heavier in-edge, higher rank") {
    // 1 splits 3:1 between 2 and 3; both return to 1
    val r = ranks(Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L)))
    assert(r(2L) > r(3L), r)
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
  }

  private def ppr(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
      iters: Int = 20) =
    PageRank.personalizedPageRank(edges.toDF("s", "t", "w"), "s", "t", "w",
        seeds.toDF("node"), iters = iters)
      .as[(Long, Double)].collect().toMap

  test("ppr: mass is conserved and concentrates near the seed") {
    // two triangles bridged by one edge; seed in the left triangle
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L),
      (3L, 4L, 1L), (4L, 5L, 1L), (5L, 6L, 1L), (6L, 4L, 1L))
    val r = ppr(edges, Seq(1L))
    assert(math.abs(r.values.sum - 1.0) < 1e-6, r)
    assert(r(1L) > r(4L) && r(2L) > r(5L), r)
  }

  test("ppr: node unreachable from seeds gets ~zero; uniform seeds = pagerank") {
    // 9 -> 1 but nothing reaches 9
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L), (9L, 1L, 1L))
    val r = ppr(edges, Seq(1L, 2L))
    assert(r(9L) < 1e-9, r)
    val all = ppr(edges, Seq(1L, 2L, 9L))
    val pr = ranks(edges)
    // uniform-seed ppr differs from pagerank only in dangling restart
    // (none here: every node has out-edges), so the two coincide
    assert(all.forall { case (n, v) => math.abs(v - pr(n)) < 1e-8 }, all)
  }

  test("ppr: dangling mass restarts at the seeds, not the whole graph") {
    // 2 is a sink; its mass must flow back to seed 1 only
    val edges = Seq((1L, 2L, 1L), (3L, 2L, 1L))
    val r = ppr(edges, Seq(1L))
    assert(math.abs(r.values.sum - 1.0) < 1e-6, r)
    assert(r(3L) == 0.0, r) // nothing ever teleports or links to 3
    assert(r(1L) > 0 && r(2L) > 0)
  }

  test("ppr: seeds absent from the graph are ignored; empty intersect rejects") {
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L))
    val r = ppr(edges, Seq(1L, 77L))
    assert(math.abs(r.values.sum - 1.0) < 1e-6, r) // |S| = 1, not 2
    intercept[IllegalArgumentException] {
      ppr(edges, Seq(77L))
    }
  }

  private def push(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
      eps: Double = 1e-9, rounds: Int = 40) =
    PageRank.pushPersonalizedPageRank(edges.toDF("s", "t", "w"), "s", "t",
        "w", seeds.toDF("node"), alpha = 0.15, eps = eps, rounds = rounds)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap

  test("push ppr: p + r mass is conserved every run") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L), (3L, 4L, 1L),
      (4L, 5L, 1L), (5L, 6L, 1L), (6L, 4L, 1L))
    for (rounds <- Seq(1, 3, 8)) {
      val st = push(edges, Seq(1L), eps = 1e-6, rounds = rounds)
      val mass = st.values.map { case (p, r) => p + r }.sum
      assert(math.abs(mass - 1.0) < 1e-6, (rounds, st))
    }
  }

  test("push ppr: with a vanishing threshold it converges to power-iteration ppr") {
    val edges = Seq((1L, 2L, 2L), (2L, 3L, 1L), (3L, 1L, 1L), (3L, 4L, 1L),
      (4L, 1L, 1L), (2L, 1L, 1L))
    val exact = ppr(edges, Seq(1L), iters = 80)
    val st = push(edges, Seq(1L), eps = 1e-9, rounds = 80)
    st.foreach { case (n, (p, r)) =>
      assert(math.abs(p - exact(n)) < 1e-5, (n, p, exact(n)))
      // residual decays geometrically (×(1−α) per push); after 80
      // rounds ~1e-6 of mass is still in flight
      assert(r < 1e-5, (n, r))
    }
  }

  test("push ppr: work stays local — an unreached component keeps exact zero") {
    // {5,6} is a separate component; no push can ever touch it
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L), (5L, 6L, 1L), (6L, 5L, 1L))
    val st = push(edges, Seq(1L), eps = 1e-6, rounds = 10)
    assert(st(5L) == ((0.0, 0.0)) && st(6L) == ((0.0, 0.0)), st)
    assert(st(1L)._1 > 0 && st(2L)._1 > 0)
  }

  test("push ppr: empty frontier is a fixpoint — extra rounds change nothing") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
    // eps = 0.5 on unit degrees: the cycling mass decays ×0.85 per
    // push and falls below the 0.5 threshold after 5 pushes, so from
    // round 6 on every round is a no-op
    val a = push(edges, Seq(1L), eps = 0.5, rounds = 6)
    val b = push(edges, Seq(1L), eps = 0.5, rounds = 12)
    assert(a == b, (a, b))
    assert(b.values.map(_._2).max >= 0.4, b) // sub-threshold mass stays
  }

  test("push ppr: dangling frontier mass returns to the seeds") {
    // 2 is a sink: every push from 2 restarts at seed 1
    val edges = Seq((1L, 2L, 1L), (3L, 2L, 1L))
    val st = push(edges, Seq(1L), eps = 1e-9, rounds = 60)
    val mass = st.values.map { case (p, r) => p + r }.sum
    assert(math.abs(mass - 1.0) < 1e-6, st)
    assert(st(3L) == ((0.0, 0.0)), st) // unreachable from the seed
    val exact = ppr(edges, Seq(1L), iters = 80)
    // ~0.85^60 ≈ 6e-5 of mass is still in-flight residual at round 60
    assert(math.abs(st(1L)._1 - exact(1L)) < 1e-4, (st(1L), exact(1L)))
    assert(math.abs(st(2L)._1 - exact(2L)) < 1e-4, (st(2L), exact(2L)))
  }
}
