package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.modelselection.Splits

/** Curriculum selection (budget prefix + anneal phases), length-bucket
  * packing, and the Efraimidis–Spirakis weighted sampler.
  */
class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  // (id, score, tokens) — scores chosen so rounding leaves ties:
  // group 0.9: ids 1,2 (10+20 tokens); 0.5: ids 3,4,5 (30+10+40);
  // 0.1: id 6 (5 tokens)
  private def scored = Seq(
    (1L, 0.9, 10L), (2L, 0.9, 20L),
    (3L, 0.5, 30L), (4L, 0.5, 10L), (5L, 0.5, 40L),
    (6L, 0.1, 5L)
  ).toDF("id", "score", "tok")

  test("budgetSelect: boundary lands mid-group — id-ordered prefix within it") {
    // budget 70: 0.9 group (30) fully in; boundary group 0.5 has r=40 →
    // id 3 (cum 30 ≤ 40) in, id 4 (cum 40 ≤ 40) in, id 5 (cum 80) out
    val sel = Curriculum.budgetSelect(scored, "id", col("score"), col("tok"), 70L)
      .select("id").as[Long].collect().sorted
    assert(sel.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("budgetSelect: exact group-border budget selects whole groups only") {
    val sel = Curriculum.budgetSelect(scored, "id", col("score"), col("tok"), 30L)
      .select("id").as[Long].collect().sorted
    assert(sel.toSeq == Seq(1L, 2L))
  }

  test("budgetSelect: budget >= total selects everything; 0 selects nothing") {
    assert(Curriculum.budgetSelect(scored, "id", col("score"), col("tok"), 1000L)
      .count() == 6)
    assert(Curriculum.budgetSelect(scored, "id", col("score"), col("tok"), 0L)
      .count() == 0)
  }

  test("annealPhases: labels partition the corpus and agree with budgetSelect") {
    val phases = Curriculum.annealPhases(scored, "id", col("score"), col("tok"), 70L)
    assert(phases.count() == 6, "every row labeled")
    val anneal = phases.filter(col("phase") === "anneal")
      .select("id").as[Long].collect().sorted.toSeq
    val sel = Curriculum.budgetSelect(scored, "id", col("score"), col("tok"), 70L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(anneal == sel, "anneal slice == the budget-selected prefix")
  }

  test("packLengthBuckets: bit-length buckets, packing local to (shard, bucket)") {
    val docs = Seq(
      // shard a: 3-token and 5-token docs land in buckets 2 and 3
      (1L, "a", "x x x"), (2L, "a", "x x x x x"),
      (3L, "a", "y y y"), // bucket 2 again: packs with id 1
      // shard b: same lengths, independent packing
      (4L, "b", "x x x")
    ).toDF("doc_id", "shard", "text")
    val out = TextStats.packLengthBuckets(docs, "text", "doc_id", "shard", budget = 4)
      .select("doc_id", "len_bucket", "pack_id")
      .as[(Long, Int, Int)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out(1L) == ((2, 0)), "3 tokens → bit-length 2, first pack")
    assert(out(2L) == ((3, 0)), "5 tokens → bit-length 3, own bucket")
    assert(out(3L) == ((2, 0)), "3+3=6 tokens overfills the open 4-budget pack (packing semantics)")
    assert(out(4L) == ((2, 0)), "shard b packs independently from shard a")
  }

  test("weightedHashSample: k >= n returns all rows; result is deterministic") {
    val df = scored.select(col("id"), col("tok").as("w"))
    val all = Splits.weightedHashSample(df, "id", "w", k = 100, salt = "t")
    assert(all.count() == 6)
    val a = Splits.weightedHashSample(df, "id", "w", k = 3, salt = "t")
      .select("id").as[Long].collect().sorted.toSeq
    val b = Splits.weightedHashSample(df, "id", "w", k = 3, salt = "t")
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b, "content-hash determinism")
  }

  test("weightedHashSample: heavy weights dominate the selection") {
    // 50 rows of weight 1000 vs 50 rows of weight 1: a 25-sample should
    // be overwhelmingly heavy rows (P[light row beats heavy] ~ w ratio)
    val df = ((1L to 50L).map(i => (i, 1000L)) ++ (51L to 100L).map(i => (i, 1L)))
      .toDF("id", "w")
    val heavy = Splits.weightedHashSample(df, "id", "w", k = 25, salt = "dom")
      .filter(col("id") <= 50).count()
    assert(heavy >= 20, s"expected heavy-weight rows to dominate, got $heavy/25")
  }
}
