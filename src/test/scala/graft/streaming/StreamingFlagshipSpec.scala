package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llmdata.{Contrastive, TextStats}

/** The streaming FLAGSHIP: the stateless/mergeable v6 stages composed
  * into ONE continuous query over one MemoryStream —
  *
  *   quality/repetition filter (stateless scan)
  *     → streaming fingerprint dedup (watermarked keep-first state)
  *       → streaming sequence packing (per-shard running-sum state)
  *         → live complete-mode shard manifests (mergeable agg state)
  *
  * — proving batch ≡ stream end-to-end on a corpus where EVERY stage
  * is non-degenerate (some docs filtered, some deduped, packs split,
  * both manifest shards populated). Spark accepts the full stateful
  * chain (dedup → flatMapGroupsWithState → aggregation) in a single
  * query; a parallel append-mode query on the packing stage (same
  * input stream, its own state) pins the intermediate rows.
  */
class StreamingFlagshipSpec extends SparkSpec {

  import spark.implicits._

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 00:$m%02d:00")

  // (doc_id, ts, shard, text): ids monotone (ingest sequence numbers —
  // the documented packing-parity condition); three micro-batches.
  private val batch1 = Seq(
    (1L, ts(1), "web", "the quick brown fox jumps high."),
    (2L, ts(2), "web", "spam spam spam spam spam spam"), // repetition-filtered
    (3L, ts(3), "lab", "measure twice and cut once today."),
    (4L, ts(4), "web", "a b"))                           // too short, filtered
  private val batch2 = Seq(
    (5L, ts(5), "web", "The quick brown fox: jumps HIGH"), // dup of 1 (normalized)
    (6L, ts(6), "lab", "results replicate across five labs."),
    (7L, ts(7), "web", "every good sentence carries weight."))
  private val batch3 = Seq(
    (8L, ts(8), "lab", "Measure twice and CUT once, today"), // dup of 3, cross-batch
    (9L, ts(9), "web", "short final doc closes the corpus."))
  private val all = batch1 ++ batch2 ++ batch3

  // Stage 1 — stateless quality/repetition filter: >= 3 tokens and the
  // most-common word-2-gram covers < 90% of the characters (on short
  // fixture docs a SINGLETON 2-gram already covers ~half, so the
  // threshold separates the spam doc's 1.55 from clean docs' ~0.5).
  private def qualityFilter(df: DataFrame): DataFrame =
    df.filter(TextStats.tokenCount(col("text")) >= 3 &&
      TextStats.topNgramCharFrac(col("text"), 2) < 0.9)

  private val budget = 10
  private val nShards = 2

  // The batch mirror of the whole pipeline: filter → keep the FIRST
  // (min-id; ids are monotone, so first-arrival ≡ min-id) doc per
  // fingerprint → per-shard first-fit packing → shard manifest.
  private def batchPipeline: (DataFrame, DataFrame) = {
    val docs = all.toDF("doc_id", "ts", "shard", "text")
    val kept = qualityFilter(docs)
      .withColumn("fingerprint", TextStats.fingerprint(col("text")))
    val first = kept.groupBy("fingerprint")
      .agg(min("doc_id").as("doc_id"))
    val deduped = kept.join(first, Seq("fingerprint", "doc_id"))
    val packed = TextStats.packSequences(deduped, "text", "doc_id",
      "shard", budget)
      .select("doc_id", "shard", "n_tokens", "pack_id")
    val manifest = Contrastive.shardManifest(packed, "doc_id", "n_tokens",
      nShards, salt = "fs1")
    (packed, manifest)
  }

  test("flagship: filter → dedup → pack → live manifest, batch ≡ stream") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, String)]
    val stream = input.toDF.toDF("doc_id", "ts", "shard", "text")

    val filtered = qualityFilter(stream)
    val deduped = StreamingAdapter.streamingFingerprintDedup(
      filtered, "text", "ts", "10 minutes")
    val packed = StreamingAdapter.streamingPackSequences(
      deduped, "text", "doc_id", "shard", budget)
    val manifest = Contrastive.shardManifest(
      packed.toDF, "doc_id", "n_tokens", nShards, salt = "fs1")

    val qManifest = manifest.writeStream.outputMode("complete")
      .format("memory").queryName("flagship_manifest").start()
    val qPacked = StreamingAdapter.streamingPackSequences(
      StreamingAdapter.streamingFingerprintDedup(
        qualityFilter(input.toDF.toDF("doc_id", "ts", "shard", "text")),
        "text", "ts", "10 minutes"),
      "text", "doc_id", "shard", budget)
      .toDF.writeStream.outputMode("append")
      .format("memory").queryName("flagship_packed").start()

    try {
      Seq(batch1, batch2, batch3).foreach { b =>
        input.addData(b)
        qManifest.processAllAvailable()
        qPacked.processAllAvailable()
      }

      val streamedPacked = spark.table("flagship_packed")
        .select("doc_id", "shard", "n_tokens", "pack_id")
        .as[(Long, String, Int, Int)].collect().sortBy(_._1).toSeq
      val streamedManifest = spark.table("flagship_manifest")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq

      val (batchPacked, batchManifest) = batchPipeline
      val bp = batchPacked.as[(Long, String, Int, Int)]
        .collect().sortBy(_._1).toSeq
      val bm = batchManifest.as[(Long, Long, Long, Long)]
        .collect().sortBy(_._1).toSeq

      assert(streamedPacked == bp,
        s"stream/batch packed diverged:\n  stream=$streamedPacked\n  batch=$bp")
      assert(streamedManifest == bm,
        s"stream/batch manifest diverged:\n  stream=$streamedManifest\n  batch=$bm")

      // every stage non-degenerate on this corpus:
      val survivors = streamedPacked.map(_._1).toSet
      assert(!survivors.contains(2L) && !survivors.contains(4L),
        "quality/repetition filter must drop docs 2 and 4")
      assert(!survivors.contains(5L) && !survivors.contains(8L),
        "fingerprint dedup must drop the later twin, incl. cross-batch doc 8")
      assert(survivors == Set(1L, 3L, 6L, 7L, 9L))
      assert(streamedPacked.map(t => (t._2, t._4)).distinct.size > 2,
        "packing must open multiple packs across shards")
      assert(streamedManifest.map(_._1).toSet == Set(0L, 1L),
        "both manifest shards populated")
      assert(streamedManifest.map(_._2).sum == survivors.size)
    } finally {
      qManifest.stop()
      qPacked.stop()
    }
  }

  test("flagship: late duplicate within the watermark still drops after many batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, String)]
    val deduped = StreamingAdapter.streamingFingerprintDedup(
      qualityFilter(input.toDF.toDF("doc_id", "ts", "shard", "text")),
      "text", "ts", "10 minutes")
    val q = deduped.select("doc_id").writeStream.outputMode("append")
      .format("memory").queryName("flagship_late").start()
    try {
      input.addData(Seq((1L, ts(1), "web", "one clear original sentence here.")))
      q.processAllAvailable()
      input.addData(Seq((2L, ts(2), "web", "unrelated middle content flows on.")))
      q.processAllAvailable()
      input.addData(Seq((3L, ts(3), "web", "One CLEAR original sentence, here")))
      q.processAllAvailable()
      val ids = spark.table("flagship_late").as[Long].collect().toSet
      assert(ids == Set(1L, 2L), s"late twin must drop, got $ids")
    } finally q.stop()
  }
}
