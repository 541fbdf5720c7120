package graft.llmdata

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    // target-flavored vocabulary
    (0L, "alpha beta gamma alpha beta", true),
    (1L, "beta gamma alpha gamma", true),
    (2L, "alpha beta beta gamma alpha", false),
    // off-distribution vocabulary
    (3L, "zork quux fnord zork quux", false),
    (4L, "fnord zork quux fnord", false)
  ).toDF("doc_id", "text", "is_target")

  test("ratio table covers the full bucket domain exactly once") {
    val docs = corpus
    val r = Dsir.bucketLogRatios(docs.filter(col("is_target")), docs, "text")
    val buckets = r.select("bucket").as[Long].collect().sorted
    assert(buckets.toSeq == (0L until Dsir.B.toLong))
  }

  test("target-flavored docs outweigh off-distribution docs") {
    val docs = corpus
    val ratios = Dsir.bucketLogRatios(docs.filter(col("is_target")), docs, "text")
    val w = Dsir.importanceWeights(docs, "text", "doc_id", ratios)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    // doc 2 shares the target vocabulary, docs 3/4 do not
    assert(w(2L) > w(3L) && w(2L) > w(4L))
    // and the weight is per-gram sensible: every target-vocab doc beats
    // every off-vocab doc
    assert(Seq(0L, 1L, 2L).map(w).min > Seq(3L, 4L).map(w).max)
  }

  test("resample: k distinct docs; a hugely upweighted doc always enters") {
    val docs = corpus
    val ratios = Dsir.bucketLogRatios(docs.filter(col("is_target")), docs, "text")
    val w = Dsir.importanceWeights(docs, "text", "doc_id", ratios)
    val picked = Dsir.resample(w, "doc_id", 3).select("doc_id")
      .as[Long].collect()
    assert(picked.length == 3 && picked.distinct.length == 3)
    val out = (0L to 4L).toSet -- picked.toSet
    val boosted = out.head
    val w2 = w.withColumn("logw",
      when(col("doc_id") === boosted, col("logw") + 1e6).otherwise(col("logw")))
    val picked2 = Dsir.resample(w2, "doc_id", 3).select("doc_id")
      .as[Long].collect()
    assert(picked2.contains(boosted))
  }
}
