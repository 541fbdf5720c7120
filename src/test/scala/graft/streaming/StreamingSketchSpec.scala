package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.relational.Sketches

/** The sketches maintain INCREMENTALLY: HLL registers are a max-per-
  * register aggregation and CMS cells a count — both mergeable
  * streaming state, so a live distinct-count / frequency monitor runs
  * the SAME operators as the batch profile with no recompute. The spec
  * feeds the corpus in arbitrary micro-batch splits and requires the
  * streamed complete-mode sketch to equal the batch sketch — the same
  * contract the shard-manifest monitor pins.
  */
class StreamingSketchSpec extends SparkSpec {

  test("streamed complete-mode HLL registers equal the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Long]
    val reg = Sketches.hllRegisters(input.toDF.toDF("k"), col("k"), "shll")
    val q = reg.writeStream.outputMode("complete")
      .format("memory").queryName("hll_stream").start()
    val keys = (0L until 400L).map(i => i % 157) // dups across batches
    try {
      input.addData(keys.take(130))
      q.processAllAvailable()
      input.addData(keys.drop(130))
      q.processAllAvailable()
      val streamed = spark.table("hll_stream")
        .as[(Long, Int)].collect().sortBy(_._1).toSeq
      val batch = Sketches.hllRegisters(
        keys.toDF("k"), col("k"), "shll")
        .as[(Long, Int)].collect().sortBy(_._1).toSeq
      assert(streamed == batch)
      // and the estimate off the streamed registers is the batch one
      val estS = Sketches.hllEstimate(spark.table("hll_stream"))
        .head().getAs[Double]("estimate")
      val estB = Sketches.hllEstimate(
        Sketches.hllRegisters(keys.toDF("k"), col("k"), "shll"))
        .head().getAs[Double]("estimate")
      assert(estS == estB)
    } finally q.stop()
  }

  test("streamed complete-mode CMS cells equal the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Long]
    val sk = Sketches.cmsSketch(input.toDF.toDF("k"), col("k"), "scms",
      depth = 3, width = 512)
    val q = sk.writeStream.outputMode("complete")
      .format("memory").queryName("cms_stream").start()
    val keys = (0L until 300L).map(i => i % 41)
    try {
      input.addData(keys.take(77))
      q.processAllAvailable()
      input.addData(keys.drop(77))
      q.processAllAvailable()
      val streamed = spark.table("cms_stream")
        .as[(Int, Long, Long)].collect().sorted.toSeq
      val batch = Sketches.cmsSketch(keys.toDF("k"), col("k"), "scms",
          depth = 3, width = 512)
        .as[(Int, Long, Long)].collect().sorted.toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streamed complete-mode quantile sketch equals the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val sk = Sketches.quantileSketch(input.toDF.toDF("g", "v"),
      col("g"), col("v"), alpha = 0.02)
    val q = sk.writeStream.outputMode("complete")
      .format("memory").queryName("qsk_stream").start()
    val rnd = new scala.util.Random(11)
    val rows = (1 to 600).map(i =>
      (if (i % 2 == 0) "x" else "y", math.exp(rnd.nextGaussian() + 2.0)))
    // the live readout after EVERY micro-batch must equal the batch
    // estimate over the prefix ingested so far — the full telemetry
    // loop (ingest → sketch → quantile) proven continuously, not just
    // the final state
    def liveEstimate() = Sketches.quantileSketchEstimate(
        spark.table("qsk_stream"), Seq(0.5, 0.9), alpha = 0.02)
      .as[(String, Double, Double)].collect().sorted.toSeq
    def prefixEstimate(prefix: Seq[(String, Double)]) =
      Sketches.quantileSketchEstimate(
        Sketches.quantileSketch(prefix.toDF("g", "v"), col("g"),
          col("v"), alpha = 0.02), Seq(0.5, 0.9), alpha = 0.02)
      .as[(String, Double, Double)].collect().sorted.toSeq
    try {
      input.addData(rows.take(201))
      q.processAllAvailable()
      assert(liveEstimate() == prefixEstimate(rows.take(201)),
        "mid-stream readout must match the prefix batch estimate")
      input.addData(rows.drop(201))
      q.processAllAvailable()
      val streamed = spark.table("qsk_stream")
        .as[(String, Long, Long)].collect().sorted.toSeq
      val batch = Sketches.quantileSketch(rows.toDF("g", "v"),
          col("g"), col("v"), alpha = 0.02)
        .as[(String, Long, Long)].collect().sorted.toSeq
      assert(streamed == batch)
      // the live estimates read off the streamed state are the batch
      // estimates — the monitor never recomputes the corpus
      val estS = Sketches.quantileSketchEstimate(
          spark.table("qsk_stream"), Seq(0.5, 0.9), alpha = 0.02)
        .as[(String, Double, Double)].collect().sorted.toSeq
      val estB = Sketches.quantileSketchEstimate(
          Sketches.quantileSketch(rows.toDF("g", "v"), col("g"), col("v"),
            alpha = 0.02), Seq(0.5, 0.9), alpha = 0.02)
        .as[(String, Double, Double)].collect().sorted.toSeq
      assert(estS == estB)
    } finally q.stop()
  }

  test("streamed complete-mode GloVe co-occurrence equals the batch X") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq((1L, "a b a b"), (2L, "b c d"), (3L, "a c a"))
    val input = MemoryStream[(Long, String)]
    val cooc = graft.llmdata.SkipGram.cooccurrenceCounts(
      input.toDF.toDF("doc_id", "text"), "text", "doc_id", window = 2)
    val q = cooc.writeStream.outputMode("complete")
      .format("memory").queryName("cooc_stream").start()
    try {
      input.addData(docs.take(1): _*)
      q.processAllAvailable()
      input.addData(docs.drop(1): _*)
      q.processAllAvailable()
      val streamed = spark.table("cooc_stream")
        .as[(String, String, Double, Long)].collect().sorted.toSeq
      val batch = graft.llmdata.SkipGram.cooccurrenceCounts(
          docs.toDF("doc_id", "text"), "text", "doc_id", window = 2)
        .as[(String, String, Double, Long)].collect().sorted.toSeq
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }
}
