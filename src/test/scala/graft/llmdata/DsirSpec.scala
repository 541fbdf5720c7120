package graft.llmdata

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // target-flavored vocabulary
    (0L, "alpha beta gamma alpha beta", true),
    (1L, "beta gamma alpha gamma", true),
    (2L, "alpha beta beta gamma alpha", false),
    // off-distribution vocabulary
    (3L, "zork quux fnord zork quux", false),
    (4L, "fnord zork quux fnord", false)
  )
  private def corpus = rows.toDF("doc_id", "text", "is_target")

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

  test("weightExpr (map-literal scan-fused path) equals importanceWeights") {
    val docs = corpus
    val ratios = Dsir.bucketLogRatios(docs.filter(col("is_target")), docs, "text")
    val viaJoin = Dsir.importanceWeights(docs, "text", "doc_id", ratios)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val m = Dsir.collectRatios(ratios)
    val viaExpr = docs.select(col("doc_id"),
        Dsir.weightExpr(col("text"), m).as("w"))
      .select(col("doc_id"), col("w.n_grams"), col("w.logw"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(viaExpr.keySet == viaJoin.keySet)
    viaJoin.foreach { case (id, (n, lw)) =>
      assert(viaExpr(id)._1 == n)
      assert(math.abs(viaExpr(id)._2 - lw) < 1e-9, s"doc $id")
    }
  }

  test("weightExpr scores a live stream (stateless — no join, no agg)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = corpus
    val ratios = Dsir.bucketLogRatios(docs.filter(col("is_target")), docs, "text")
    val m = Dsir.collectRatios(ratios)
    val expected = docs.select(col("doc_id"),
        Dsir.weightExpr(col("text"), m).as("w"))
      .select(col("doc_id"), col("w.logw"))
      .as[(Long, Double)].collect().toMap
    val input = MemoryStream[(Long, String)]
    val scored = input.toDF.toDF("doc_id", "text")
      .select(col("doc_id"), Dsir.weightExpr(col("text"), m).as("w"))
      .select(col("doc_id"), col("w.logw").as("logw"))
    val q = scored.writeStream.outputMode("append")
      .format("memory").queryName("dsir_stream").start()
    try {
      input.addData(rows.map { case (id, t, _) => (id, t) }: _*)
      q.processAllAvailable()
      val got = spark.table("dsir_stream")
        .as[(Long, Double)].collect().toMap
      assert(got.keySet == expected.keySet)
      expected.foreach { case (id, lw) =>
        assert(math.abs(got(id) - lw) < 1e-9, s"doc $id") }
    } finally q.stop()
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
