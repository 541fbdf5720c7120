package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SccSpec extends SparkSpec {

  test("pivot SCC = forward ∩ backward reach on a known digraph") {
    import spark.implicits._
    // cycle 1→2→3→1 with an out-tail 3→4→5 and an in-tail 6→1
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (6L, 1L)).toDF("src", "dst")
    val got = Scc.pivotScc(e, "src", "dst", pivot = 1L, rounds = 6)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    assert(got.filter(_._2).keySet == Set(1L, 2L, 3L),
      s"SCC(1) must be the cycle, got $got")
    assert(!got(4L) && !got(5L), "out-tail is fwd-only")
    assert(!got(6L), "in-tail is bwd-only")
  }

  test("singleton pivot: a DAG node is its own component") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Scc.pivotScc(e, "src", "dst", pivot = 2L, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    assert(got.filter(_._2).keySet == Set(2L))
  }

  test("dominanceEdges keeps strict winners, drops ties and self-loops") {
    import spark.implicits._
    val w = Seq(
      (1L, 2L, 10L), (2L, 1L, 4L),  // 1→2 dominates
      (2L, 3L, 5L), (3L, 2L, 5L),   // tie: both drop
      (3L, 4L, 7L),                 // one-sided: kept
      (4L, 4L, 9L)                  // self-loop: drops (w > w false)
    ).toDF("src", "dst", "w")
    val got = Scc.dominanceEdges(w, "src", "dst", "w")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (3L, 4L)), s"got $got")
  }

  test("dominance sparsifier preserves asymmetric cycles") {
    import spark.implicits._
    // 3-cycle of strict dominance: 1 beats 2, 2 beats 3, 3 beats 1
    val w = Seq((1L, 2L, 9L), (2L, 1L, 1L), (2L, 3L, 8L), (3L, 2L, 2L),
      (3L, 1L, 7L), (1L, 3L, 3L)).toDF("src", "dst", "w")
    val de = Scc.dominanceEdges(w, "src", "dst", "w")
    val got = Scc.pivotScc(de, "src", "dst", pivot = 1L, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    assert(got.filter(_._2).keySet == Set(1L, 2L, 3L))
  }
}
