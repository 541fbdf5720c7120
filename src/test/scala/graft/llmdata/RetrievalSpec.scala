package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def list(rows: (Long, Int)*) =
    rows.toSeq.toDF("doc_id", "rank")

  test("rrfFuse matches the hand-computed RRF formula") {
    // list A: 1,2,3  list B: 2,3,4
    val a = list(10L -> 1, 20L -> 2, 30L -> 3)
    val b = list(20L -> 1, 30L -> 2, 40L -> 3)
    val out = Retrieval.rrfFuse(Seq(a, b), "doc_id", "rank", k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    def rrf(ranks: Int*) = ranks.map(r => 1.0 / (60 + r)).sum
    // 20: 1/62+1/61 > 30: 1/63+1/62 > 10: 1/61 > 40: 1/63
    assert(out.map(_._2).toSeq == Seq(20L, 30L, 10L, 40L))
    val byId = out.map(t => t._2 -> t._3).toMap
    assert(byId(20L) ~== rrf(2, 1))
    assert(byId(30L) ~== rrf(3, 2))
    assert(byId(10L) ~== rrf(1))
    assert(byId(40L) ~== rrf(3))
    val nLists = out.map(t => t._2 -> t._4).toMap
    assert(nLists == Map(10L -> 1L, 20L -> 2L, 30L -> 2L, 40L -> 1L))
  }

  test("absence contributes zero, not a worst-rank penalty") {
    // doc 1 is #1 in one list only; doc 2 is mid-rank in both lists.
    // With absence-as-zero, two mid ranks beat one top rank:
    // 1/61 = 0.01639 < 1/65 + 1/65 = 0.03077
    val a = list(1L -> 1, 2L -> 5)
    val b = list(2L -> 5, 3L -> 1)
    val top = Retrieval.rrfFuse(Seq(a, b), "doc_id", "rank", k = 1)
      .collect().head
    assert(top.getLong(1) == 2L)
  }

  test("ties on rrf break by ascending id") {
    // symmetric ranks → identical sums for 7 and 9
    val a = list(9L -> 1, 7L -> 2)
    val b = list(7L -> 1, 9L -> 2)
    val out = Retrieval.rrfFuse(Seq(a, b), "doc_id", "rank", k = 2)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(out == Seq(7L, 9L))
  }

  test("single list degenerates to the input ranking") {
    val a = list(5L -> 1, 6L -> 2, 7L -> 3)
    val out = Retrieval.rrfFuse(Seq(a), "doc_id", "rank", k = 3)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(out == Seq(5L, 6L, 7L))
  }

  test("plan shape: no Window node — the final order comes from the bounded heap") {
    val a = list(1L -> 1); val b = list(2L -> 1)
    val plan = Retrieval.rrfFuse(Seq(a, b), "doc_id", "rank", k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
  }

  // MMR candidates: two tight clusters of near-duplicates; cluster A
  // slightly more relevant than cluster B
  private def mmrCands = Seq(
    (1L, 0.99, Array(1.0f, 0.0f)), (2L, 0.98, Array(0.999f, 0.01f)),
    (3L, 0.97, Array(0.998f, 0.02f)),
    (4L, 0.80, Array(0.0f, 1.0f)), (5L, 0.79, Array(0.01f, 0.999f)))
    .toDF("id", "rel", "vec")

  test("mmrSelect with lambda=1 reduces to pure relevance top-k") {
    val got = Retrieval.mmrSelect(mmrCands, "id", "rel", "vec",
      k = 3, lambda = 1.0).collect().map(_.getLong(1)).toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("mmrSelect diversifies: second pick jumps to the other cluster") {
    val got = Retrieval.mmrSelect(mmrCands, "id", "rel", "vec",
      k = 3, lambda = 0.5).collect().map(_.getLong(1)).toSeq
    assert(got.head == 1L)
    assert(got(1) == 4L, s"expected cross-cluster pick, got $got")
    // third pick returns to cluster A's best remaining
    assert(got(2) == 2L)
  }

  test("mmrSelect with k beyond the candidate count stops cleanly") {
    val got = Retrieval.mmrSelect(mmrCands, "id", "rel", "vec",
      k = 12, lambda = 0.7).collect()
    assert(got.length === 5)
    assert(got.map(_.getLong(1)).toSet === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("mmrSelect scores are monotone non-increasing in pick order") {
    val scores = Retrieval.mmrSelect(mmrCands, "id", "rel", "vec",
      k = 5, lambda = 0.7).collect().map(_.getDouble(2)).toSeq
    assert(scores.zip(scores.tail).forall { case (a, b) => b <= a + 1e-9 })
  }
}
