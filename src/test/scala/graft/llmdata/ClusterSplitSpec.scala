package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Hashing

class ClusterSplitSpec extends SparkSpec {

  private def fixture() = {
    import spark.implicits._
    // 40 docs; near-dup chains {1,2,3}, {10,11}, {20,21,22,23}
    val docs = (1L to 40L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
      (21L, 22L), (22L, 23L)).toDF("id_a", "id_b")
    (docs, pairs)
  }

  test("no near-dup pair ever straddles splits") {
    val (docs, pairs) = fixture()
    val assign = Dedup.leakageSafeSplit(docs, "doc_id", pairs)
    val audit = Dedup.splitLeakage(assign, pairs).collect()
    assert(audit.forall(_.getLong(3) == 0L), "cluster-keyed split leaked")
    // every cluster is wholly inside one split
    val perCluster = assign.groupBy("cluster")
      .agg(count_distinct(col("split")).as("k")).collect()
    assert(perCluster.forall(_.getLong(1) == 1L))
    assert(assign.count() == 40, "one row per document")
  }

  test("the guard is load-bearing: a doc-keyed split DOES leak here") {
    val (docs, pairs) = fixture()
    val docKeyed = docs.select(col("doc_id"),
      col("doc_id").as("cluster"),
      when(Hashing.bucket(col("doc_id"), "clsplit", 10) < 8, "train")
        .otherwise("holdout").as("split"))
    val leaked = Dedup.splitLeakage(docKeyed, pairs)
      .collect().map(_.getLong(3)).head
    assert(leaked > 0,
      "fixture must demonstrate doc-keyed leakage (pick other ids if 0)")
  }

  test("split ratios track the bounds on singleton-heavy corpora") {
    import spark.implicits._
    val docs = (1L to 2000L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val counts = Dedup.leakageSafeSplit(docs, "doc_id", pairs)
      .groupBy("split").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("train") > 1400 && counts("train") < 1800, s"$counts")
    assert(counts("val") > 100 && counts("val") < 320, s"$counts")
    assert(counts("test") > 100 && counts("test") < 320, s"$counts")
  }
}
