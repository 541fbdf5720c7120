package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalPackSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Seq(
    // (id, shard, text, n_images)
    (1L, "a", "w1 w2 w3", 0),
    (2L, "a", "w1 w2", 2),       // 2 + 2*64 = 130 tokens
    (3L, "a", "w1", 1),          // 1 + 64 = 65
    (4L, "b", "w1 w2 w3 w4", 3), // 4 + 192 = 196
    (5L, "b", "w1", 0))
    .toDF("doc_id", "shard", "text", "n_images")

  test("packMultimodal: combined cost = text tokens + n_images * imageTokens") {
    val out = Multimodal.packMultimodal(docs, "text", "doc_id", "shard",
      "n_images", budget = 200, imageTokens = 64)
      .select("doc_id", "n_text_tokens", "n_mm_tokens")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(out(1L) == ((3, 3)))
    assert(out(2L) == ((2, 130)))
    assert(out(3L) == ((1, 65)))
    assert(out(4L) == ((4, 196)))
  }

  test("packMultimodal: greedy first-fit per shard on the combined cost") {
    // shard a cumulative: 3, 133, 198 -> starts 0, 3, 133 -> packs 0,0,0
    // under budget 200; budget 100: starts 0,3,133 -> packs 0,0,1
    val out = Multimodal.packMultimodal(docs, "text", "doc_id", "shard",
      "n_images", budget = 100, imageTokens = 64)
      .select("doc_id", "pack_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(out(1L) == 0 && out(2L) == 0)
    assert(out(3L) == 1, "third doc starts at cum 133 -> pack 1")
    // shard b independent: starts 0, 196 -> packs 0, 1
    assert(out(4L) == 0 && out(5L) == 1)
  }

  test("packMultimodal: zero images degenerates to packSequences") {
    val textOnly = docs.withColumn("n_images", lit(0))
    val mm = Multimodal.packMultimodal(textOnly, "text", "doc_id", "shard",
      "n_images", budget = 4, imageTokens = 64)
      .select(col("doc_id"), col("n_text_tokens").as("n_tokens"),
        col("pack_id"))
    val plain = TextStats.packSequences(textOnly, "text", "doc_id",
      "shard", budget = 4)
      .select(col("doc_id"), col("n_tokens"), col("pack_id"))
    assert(mm.except(plain).isEmpty && plain.except(mm).isEmpty)
  }

  test("packMultimodal: imageTokens = 0 ignores images entirely") {
    val out = Multimodal.packMultimodal(docs, "text", "doc_id", "shard",
      "n_images", budget = 200, imageTokens = 0)
      .select("doc_id", "n_mm_tokens", "n_text_tokens").collect()
    out.foreach(r => assert(r.getInt(1) == r.getInt(2)))
  }
}
