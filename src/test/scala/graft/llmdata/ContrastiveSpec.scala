package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ContrastiveSpec extends SparkSpec {

  import spark.implicits._

  test("inBatchNegatives: pairs stay in-batch, cross-label, no self-pairs, both directions") {
    val df = (0L until 40L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val pairs = Contrastive.inBatchNegatives(df, "id", "lang", nBatches = 4,
      salt = "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.nonEmpty)
    // recompute batch assignment with the identical md5 expression
    val batch = df.select(col("id"),
        pmod(conv(substring(md5(concat(lit("t"), col("id").cast("string"))), 1, 15),
          16, 10).cast("long"), lit(4L)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lang = (0L until 40L).map(i => i -> (if (i % 2 == 0) "en" else "de")).toMap
    for ((b, a, n) <- pairs) {
      assert(a != n, "no self pairs")
      assert(batch(a) == b && batch(n) == b, "pair crosses batches")
      assert(lang(a) != lang(n), "same-label pair leaked in as a negative")
    }
    // asymmetric listing: (a, n) present iff (n, a) present
    val set = pairs.map(p => (p._2, p._3)).toSet
    assert(set.forall { case (a, n) => set.contains((n, a)) })
  }

  test("hardNegatives: cross-label only, ranks contiguous, cos non-increasing") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0.8f, 0.2f), 1), (3L, Array(0.0f, 1.0f), 1),
      (4L, Array(0.5f, 0.5f), 1)).toDF("id", "v", "lbl")
    val out = Contrastive.hardNegatives(vecs, vecs.filter($"id" === 0L),
      "id", "v", "lbl", k = 2).orderBy("rank").collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2))
    // anchor 0 (label 0): nearest cross-label is 2, then 4
    assert(out.map(_.getAs[Long]("neg_id")).toSeq == Seq(2L, 4L))
    val cs = out.map(_.getAs[Double]("cos"))
    assert(cs(0) >= cs(1))
  }

  test("shardManifest: totals partition the corpus; checksum detects a dropped row") {
    val df = (0L until 100L).map(i => (i, 10L + i)).toDF("id", "sz")
    val m = Contrastive.shardManifest(df, "id", "sz", nShards = 4, salt = "s")
      .collect()
    assert(m.map(_.getAs[Long]("n_docs")).sum == 100L)
    assert(m.map(_.getAs[Long]("total_size")).sum == (0L until 100L).map(10L + _).sum)
    val m2 = Contrastive.shardManifest(df.filter($"id" =!= 57L), "id", "sz",
      nShards = 4, salt = "s").collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("checksum")).toMap
    val m1 = m.map(r => r.getAs[Long]("shard") -> r.getAs[Long]("checksum")).toMap
    // exactly the shard containing id=57 changes its checksum
    assert(m1.count { case (s, c) => m2.get(s).contains(c) } == 3)
  }

  test("embeddingOutliers: the planted far vector is the label's only outlier") {
    val vecs = (
      (0 until 9).map(i => (i.toLong, Array(1.0f + 0.01f * i, 0.0f), 0)) :+
        (9L, Array(50.0f, 50.0f), 0) // planted outlier, label 0
      ).toSeq.toDF("id", "v", "lbl")
    val out = Ann.embeddingOutliers(vecs, "id", "v", "lbl", sigmas = 2.0)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("outlier")).toMap
    assert(out(9L), "planted vector must flag")
    assert((0L until 9L).forall(i => !out(i)), "inliers must not flag")
  }

  test("concentrationReport: Gini/HHI/top-shares match the closed form") {
    val df = Seq(("a", 1), ("b", 1), ("c", 2), ("d", 4)).toDF("k", "w")
    val r = TextStats.concentrationReport(df, "k", col("w"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // sorted [1,1,2,4]: G = 2·25/(4·8) − 5/4 = 0.3125
    assert(r("gini") ~== 0.3125)
    assert(r("hhi") ~== 22.0 / 64.0)
    assert(r("top1_share") ~== 0.5)
    assert(r("top3_share") ~== 7.0 / 8.0)
    assert(r("n_keys") ~== 4.0)
  }
}
