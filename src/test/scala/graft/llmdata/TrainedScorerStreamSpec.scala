package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The trained scorers are stateless scan-fused expressions (weights
  * in-plan), so the IDENTICAL expression scores a live stream — the
  * same batch/stream parity the C4 preset and DSIR weightExpr carry.
  * This is the deployment shape: train offline on a corpus snapshot,
  * apply the frozen weights to the ingest stream.
  */
class TrainedScorerStreamSpec extends SparkSpec {
  import spark.implicits._

  test("quality-classifier margin scores a live stream unchanged") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val (w, b) = QualityClassifier.trained(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).limit(40)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val expected = docs.map { case (id, t) =>
      id -> graft.functions.HashedLinearScore.compute(t, w, b)
    }.toMap
    val input = MemoryStream[(Long, String)]
    val scored = input.toDF.toDF("doc_id", "text")
      .select(col("doc_id"),
        QualityClassifier.marginExpr(col("text"), w, b).as("margin"))
    val q = scored.writeStream.outputMode("append")
      .format("memory").queryName("qc_stream").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("qc_stream").as[(Long, Double)].collect().toMap
      assert(got == expected)
    } finally q.stop()
  }

  test("trained langid predicts on a live stream unchanged") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val models = LangIdClassifier.trained(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).limit(40)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val expected = Tables.documents(spark, sfDir).limit(40)
      .select(col("doc_id"),
        LangIdClassifier.predictExpr(col("text"), models))
      .as[(Long, String)].collect().toMap
    val input = MemoryStream[(Long, String)]
    val pred = input.toDF.toDF("doc_id", "text")
      .select(col("doc_id"),
        LangIdClassifier.predictExpr(col("text"), models).as("pred"))
    val q = pred.writeStream.outputMode("append")
      .format("memory").queryName("lid_stream").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("lid_stream").as[(Long, String)].collect().toMap
      assert(got == expected)
    } finally q.stop()
  }
}
