package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.llmdata.Contrastive

/** Shard manifests maintain INCREMENTALLY: the same
  * [[Contrastive.shardManifest]] aggregation runs unchanged as a
  * streaming complete-mode query — per-shard counts / byte sums / xor
  * checksums are all mergeable aggregation state, so an ingestion
  * pipeline keeps its manifest live without any batch recompute. The
  * spec feeds the corpus in two micro-batches and requires the final
  * streamed manifest to equal the batch operator on the full corpus —
  * including the order-independence of the checksum (the batches split
  * the id space arbitrarily).
  */
class StreamingManifestSpec extends SparkSpec {

  test("streamed complete-mode manifest equals the batch manifest") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val manifest = Contrastive.shardManifest(
      input.toDF.toDF("id", "sz"), "id", "sz", nShards = 4, salt = "sm")
    val q = manifest.writeStream.outputMode("complete")
      .format("memory").queryName("manifest_test").start()
    val rows = (0L until 60L).map(i => (i, 100L + i))
    try {
      input.addData(rows.take(23)) // arbitrary split point
      q.processAllAvailable()
      input.addData(rows.drop(23))
      q.processAllAvailable()
      val streamed = spark.table("manifest_test")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      val batch = Contrastive.shardManifest(
        rows.toDF("id", "sz"), "id", "sz", nShards = 4, salt = "sm")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(streamed == batch,
        s"stream/batch manifests diverged:\n  stream=$streamed\n  batch=$batch")
      assert(streamed.map(_._2).sum == 60L)
    } finally q.stop()
  }
}
