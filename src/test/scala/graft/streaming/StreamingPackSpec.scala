package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llmdata.TextStats

/** Streaming sequence packing: cross-micro-batch running token state
  * and exact parity with the batch operator under monotone id arrival.
  */
class StreamingPackSpec extends SparkSpec {

  test("per-shard packs continue across micro-batches; parity with batch packing") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val packed = StreamingAdapter.streamingPackSequences(
      input.toDF.toDF("doc_id", "shard", "text"), "text", "doc_id",
      "shard", budget = 6)
    val q = packed.toDF.writeStream.outputMode("append")
      .format("memory").queryName("pack_test").start()
    // batch 1: shard a fills 5 of 6; shard b starts its own pack
    // batch 2: shard a id 3 (3 tokens) overfills pack 0 → id 4 starts pack 1
    val rows = Seq(
      (1L, "a", "w w w"), (2L, "a", "w w"), (10L, "b", "w w w w"),
      (3L, "a", "w w w"), (4L, "a", "w w"), (11L, "b", "w w w"))
    try {
      input.addData(rows.take(3))
      q.processAllAvailable()
      input.addData(rows.drop(3))
      q.processAllAvailable()
      val streamed = spark.table("pack_test")
        .select("doc_id", "shard", "n_tokens", "pack_id", "pack_offset")
        .as[(Long, String, Int, Int, Int)].collect().sortBy(_._1).toSeq
      // ids arrive monotonically per shard → must equal the batch
      // operator on the concatenated corpus (pack_offset included:
      // the trainer boundary info must survive streaming too)
      val batch = TextStats.packSequences(
        rows.toDF("doc_id", "shard", "text"), "text", "doc_id", "shard",
        budget = 6)
        .select("doc_id", "shard", "n_tokens", "pack_id", "pack_offset")
        .as[(Long, String, Int, Int, Int)].collect().sortBy(_._1).toSeq
      assert(streamed == batch,
        s"stream/batch packing diverged:\n  stream=$streamed\n  batch=$batch")
      val byId = streamed.map(t => t._1 -> t._4).toMap
      assert(byId(3L) == 0, "cross-batch doc overfills the still-open pack 0")
      assert(byId(4L) == 1, "next doc starts pack 1 (state carried over)")
      assert(byId(11L) == 0, "shard b packs independently")
    } finally q.stop()
  }

  test("id order within a micro-batch is enforced even if arrival order is not") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val packed = StreamingAdapter.streamingPackSequences(
      input.toDF.toDF("doc_id", "shard", "text"), "text", "doc_id",
      "shard", budget = 4)
    val q = packed.toDF.writeStream.outputMode("append")
      .format("memory").queryName("pack_order_test").start()
    try {
      // one batch, ids deliberately out of order: 2 then 1
      input.addData(Seq((2L, "a", "w w w"), (1L, "a", "w w w")))
      q.processAllAvailable()
      val byId = spark.table("pack_order_test")
        .select("doc_id", "pack_id").as[(Long, Int)].collect().toMap
      assert(byId(1L) == 0 && byId(2L) == 0,
        s"id-sorted packing: 1 starts pack 0, 2 overfills it, got $byId")
    } finally q.stop()
  }
}
