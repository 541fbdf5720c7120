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
}
