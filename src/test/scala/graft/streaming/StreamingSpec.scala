package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.wrappers.LocalSGD

/** True Structured-Streaming runs (MemoryStream source → micro-batches),
  * not just the batch execution path of the same plans.
  */
class StreamingSpec extends SparkSpec {

  private def ts(h: Int, m: Int) =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("windowedAggregate: watermarked tumbling windows over a live stream") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = StreamingAdapter.windowedAggregate(
      input.toDF.toDF("ts", "value"), "ts", "value", "1 hour", "10 minutes")
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("win_test").start()
    try {
      input.addData((ts(1, 5), 1.0), (ts(1, 20), 2.0), (ts(2, 10), 5.0))
      q.processAllAvailable()
      // late event far past the watermark (= max event time − 10 min):
      // its 00:00 window must be dropped, not created
      input.addData((ts(0, 30), 100.0))
      q.processAllAvailable()
      val rows = spark.table("win_test")
        .groupBy("window_start")
        .agg(max("n_events").as("n"), max("sum_value").as("s"))
        .collect()
        .map(r => r.getTimestamp(0).toString -> (r.getLong(1), r.getDouble(2)))
        .toMap
      assert(rows("2024-01-01 01:00:00.0") == ((2L, 3.0)))
      assert(rows("2024-01-01 02:00:00.0") == ((1L, 5.0)))
      assert(!rows.contains("2024-01-01 00:00:00.0"),
        "late row past the watermark must be dropped")
    } finally q.stop()
  }

  test("OnlineLearnerSink.attach learns from a real stream") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Double, Double)]
    val sink = new OnlineLearnerSink(new LocalSGD("squared", 0.05), Seq("x"), "y")
    val q = sink.attach(input.toDF.toDF("x", "y")).start()
    try {
      val rnd = new scala.util.Random(4)
      (0 until 5).foreach { _ =>
        input.addData((1 to 200).map { _ =>
          val x = rnd.nextDouble() * 2; (x, 3 * x + 1)
        })
        q.processAllAvailable()
      }
      assert(sink.state.seen == 1000)
      assert(math.abs(sink.model.predict(Array(1.0)) - 4.0) < 0.3)
    } finally q.stop()
  }

  test("OnlineLearnerSink folds partitions: a wide batch never rides one collect") {
    // 32-partition batch far larger than one "block": every row must be
    // seen exactly once, visited partition-by-partition (single-partition
    // jobs, driver holds at most one partition), and the learner still
    // converges on the linear law
    val sink = new OnlineLearnerSink(new LocalSGD("squared", 0.05), Seq("x"), "y")
    val batch = spark.range(0, 20000, 1, 32)
      .select(((col("id") % 200) / 100.0).as("x"))
      .withColumn("y", col("x") * 3 + 1)
    sink.processBatch(batch, 0L)
    assert(sink.state.seen == 20000)
    assert(math.abs(sink.model.predict(Array(1.0)) - 4.0) < 0.3)
  }

  test("sessionAggregate merges gap-bounded sessions on a live stream") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamingAdapter.sessionAggregate(
      input.toDF.toDF("ts", "user", "value"), "ts", "value", "user", "5 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sess_test").start()
    try {
      // u1: two events 3 min apart (one session), then one 20 min later
      input.addData((ts(1, 0), "u1", 1.0), (ts(1, 3), "u1", 2.0),
        (ts(1, 23), "u1", 4.0), (ts(1, 1), "u2", 8.0))
      q.processAllAvailable()
      val rows = spark.table("sess_test")
        .select("user", "n_events", "sum_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set(("u1", 2L, 3.0), ("u1", 1L, 4.0), ("u2", 1L, 8.0)))
    } finally q.stop()
  }

  test("runningStats: flatMapGroupsWithState carries Welford state across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val out = StreamingAdapter.runningStats(
      input.toDF.toDF("user", "value"), "user", "value")
    val q = out.toDF.writeStream.outputMode("update")
      .format("memory").queryName("rs_test").start()
    try {
      input.addData((1L, 2.0), (1L, 4.0), (2L, 10.0))
      q.processAllAvailable()
      input.addData((1L, 6.0)) // state must carry: user 1 now n=3
      q.processAllAvailable()
      val last = spark.table("rs_test")
        .groupBy("key").agg(max("n").as("n"), max("sum_scaled").as("s"),
          max_by(col("mean"), col("n")).as("mean"),
          max_by(col("variance"), col("n")).as("variance"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
      assert(last(1L)._1 == 3L && last(1L)._2 == 120000L)
      assert(last(1L)._3 ~== 4.0) // mean(2,4,6)
      assert(last(1L)._4 ~== (8.0 / 3)) // var_pop(2,4,6)
      assert(last(2L) == ((1L, 100000L, 10.0, 0.0)))
    } finally q.stop()
  }

  test("streamingFingerprintDedup keeps first arrival per normalized text") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingAdapter.streamingFingerprintDedup(
      input.toDF.toDF("ts", "doc_id", "text"), "text", "ts", "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_test").start()
    try {
      // doc 2 is doc 1 modulo case/punctuation (same fingerprint);
      // doc 3 is distinct; doc 4 repeats doc 3 exactly in a later batch
      input.addData(
        (ts(1, 0), 1L, "Hello, World"),
        (ts(1, 1), 2L, "hello world!"),
        (ts(1, 2), 3L, "something else"))
      q.processAllAvailable()
      input.addData((ts(1, 5), 4L, "something else"))
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("doc_id")
        .as[Long].collect().toSet
      // one representative per fingerprint: {1|2} and 3 (4 is a
      // cross-batch exact dup of 3 inside the watermark horizon)
      assert(ids.size == 2 && ids.contains(3L) &&
        (ids.contains(1L) || ids.contains(2L)), s"got $ids")
    } finally q.stop()
  }

  test("streamingDecontaminate drops n-gram-overlap docs on a live stream, stateless") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val contamination = Seq("alpha beta gamma").toDF("text")
    val input = MemoryStream[(Long, String)]
    val out = StreamingAdapter.streamingDecontaminate(
      input.toDF.toDF("doc_id", "text"), "text", contamination, "text", n = 3)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("decontam_test").start()
    try {
      input.addData(
        (1L, "x alpha beta gamma y"), // contaminated mid-document
        (2L, "clean words only here"),
        (3L, "al be"))                // < n tokens: passes through
      q.processAllAvailable()
      input.addData((4L, "alpha beta gamma")) // exact eval text, later batch
      q.processAllAvailable()
      val ids = spark.table("decontam_test").select("doc_id")
        .as[Long].collect().toSet
      assert(ids == Set(2L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("streamingSkipGramPositives: streamed pairs equal the batch pairs") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq((1L, "a b c d"), (2L, "b e"), (3L, "x"))
    val input = MemoryStream[(Long, String)]
    val out = StreamingAdapter.streamingSkipGramPositives(
      input.toDF.toDF("doc_id", "text"), "text", "doc_id", window = 2)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sg_stream_test").start()
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      input.addData(docs.drop(2): _*) // later micro-batch
      q.processAllAvailable()
      val streamed = spark.table("sg_stream_test").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getInt(3), r.getString(4))).toSeq.sorted
      val batch = graft.llmdata.SkipGram.positives(
          docs.toDF("doc_id", "text"), "text", "doc_id", window = 2)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getInt(3), r.getString(4))).toSeq.sorted
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("streamingIntervalJoin pairs events within the lookback, across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val errs = MemoryStream[(Timestamp, Long, Long)]
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val joined = StreamingAdapter.streamingIntervalJoin(
      errs.toDF.toDF("e_ts", "e_user", "e_id"),
      clicks.toDF.toDF("c_ts", "c_user", "c_id"),
      "e_ts", "c_ts", "e_user", "c_user", "10 minutes")
    val q = joined.select("e_id", "c_id").writeStream.outputMode("append")
      .format("memory").queryName("ij_test").start()
    try {
      clicks.addData((ts(1, 0), 7L, 100L), (ts(1, 12), 7L, 101L),
        (ts(1, 0), 8L, 102L))
      q.processAllAvailable()
      // error arrives in a LATER micro-batch: buffered click state must
      // still match; (1:15) reaches back 10 min -> click 101 only;
      // user 8's click is outside the error's user group
      errs.addData((ts(1, 15), 7L, 200L))
      q.processAllAvailable()
      // same-batch pairing + inclusive right edge (click at exactly e_ts)
      clicks.addData((ts(1, 30), 7L, 103L))
      errs.addData((ts(1, 30), 7L, 201L))
      q.processAllAvailable()
      val got = spark.table("ij_test").as[(Long, Long)].collect().toSet
      assert(got == Set((200L, 101L), (201L, 103L)), s"got $got")
    } finally q.stop()
  }
}
