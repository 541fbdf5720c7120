package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.llmdata.Dedup

class StreamingLshDedupSpec extends SparkSpec {

  test("stateful LSH dedup on a live stream: buckets persist across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val cands = StreamingAdapter.streamingLshCandidates(
      input.toDF.toDF("doc_id", "text"), "text", "doc_id",
      k = 8, rowsPerBand = 4, shingleN = 3)
    val q = cands.toDF.writeStream.outputMode("append")
      .format("memory").queryName("lsh_cand_test").start()
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    try {
      input.addData(
        (1L, base),
        (2L, "totally different words about completely other things here now"),
        (3L, "yet another unrelated document body with its own content"))
      q.processAllAvailable()
      // batch 2: doc 4 repeats doc 1's text VERBATIM (every band must hit
      // the bucket doc 1 claimed in batch 1), doc 5 is fresh
      input.addData((4L, base), (5L, "fresh unrelated text arriving later on"))
      q.processAllAvailable()
      val out = spark.table("lsh_cand_test")
        .select("doc_id", "rep_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out.contains((4L, 1L)),
        s"cross-batch duplicate must surface as a candidate, got $out")
      assert(!out.exists(_._1 == 5L), s"fresh doc flagged: $out")
      assert(!out.exists(p => Set(1L, 2L, 3L)(p._1)),
        s"first arrivals must keep their buckets, got $out")
      // the deduped stream = docs minus candidate ids
      val kept = StreamingAdapter.dropLshCandidates(
        Seq((1L, base), (2L, "b"), (3L, "c"), (4L, base), (5L, "e"))
          .toDF("doc_id", "text"),
        spark.table("lsh_cand_test"), "doc_id")
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 3L, 5L), s"got $kept")
    } finally q.stop()
  }

  test("near-dup (not just exact) text lands in its source's bucket") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val cands = StreamingAdapter.streamingLshCandidates(
      input.toDF.toDF("doc_id", "text"), "text", "doc_id",
      k = 8, rowsPerBand = 1, shingleN = 3) // per-hash bands: max recall
    val q = cands.toDF.writeStream.outputMode("append")
      .format("memory").queryName("lsh_near_test").start()
    val orig = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val nearDup = orig.replace("omicron", "patched") // one mid-doc word
    try {
      input.addData((10L, orig))
      q.processAllAvailable()
      input.addData((11L, nearDup))
      q.processAllAvailable()
      val out = spark.table("lsh_near_test")
        .select("doc_id", "rep_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out.contains((11L, 10L)),
        s"near-dup must share a band with its source, got $out")
    } finally q.stop()
  }

  test("batch mode covers the verified minhash family (rep = bucket min)") {
    val docs = Tables.documents(spark, sfDir)
    // the q_dedup_minhash_default configuration: t=0.8, k=64, bands of 4
    val verified = Dedup.minhashNearDupPairs(docs, "text", "doc_id")
    val pairs = verified.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    verified.unpersist(blocking = false)
    assert(pairs.nonEmpty, "gate corpus must have verified near-dup pairs")
    val cands = StreamingAdapter.streamingLshCandidates(
      docs, "text", "doc_id", k = 64, rowsPerBand = 4, shingleN = 3)
      .collect()
    val candDocs = cands.map(_.doc_id).toSet
    // a verified pair (a<b) shares a bucket whose min is <= a, so b is
    // always flagged — the streaming relation COVERS the verified one
    pairs.foreach { case (a, b) =>
      assert(candDocs.contains(b),
        s"verified pair ($a,$b): larger id must be a streaming candidate")
    }
    // batch determinism: the representative is the bucket minimum
    cands.foreach(c => assert(c.rep_id < c.doc_id,
      s"rep must be the bucket min: $c"))
  }
}
