package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.quality.Constraints

/** Data-quality rules as a LIVE monitor: the same
  * [[Constraints.violationAggs]] columns run unchanged as a
  * complete-mode streaming aggregation — conditional violation sums
  * are mergeable state, so an ingestion pipeline watches rule
  * violations accumulate without batch recomputes. (`unique` and
  * referential rules stay batch-side — exact distinct and a second
  * relation don't stream; the operator's scaladoc draws the line.)
  */
class StreamingConstraintsSpec extends SparkSpec {
  import Constraints._

  test("streamed complete-mode violation counts equal the batch suite") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val checks = Seq(notNull("s"), inRange("v", 0, 100),
      matches("s", "^[a-z]+$"))
    val input = MemoryStream[(String, Double)]
    val aggs = violationAggs(checks)
    val monitored = input.toDF.toDF("s", "v")
      .agg(aggs.head, aggs.tail: _*)
    val q = monitored.writeStream.outputMode("complete")
      .format("memory").queryName("dq_test").start()
    val rows = Seq(("ok", 5.0), ("fine", 50.0), ("BAD", 500.0),
      (null, 7.0), ("also", -3.0), ("good", 99.0))
    try {
      input.addData(rows.take(2))
      q.processAllAvailable()
      input.addData(rows.drop(2))
      q.processAllAvailable()
      val streamed = spark.table("dq_test")
        .as[(Long, Long, Long, Long)].collect().head
      val batch = rows.toDF("s", "v").agg(aggs.head, aggs.tail: _*)
        .as[(Long, Long, Long, Long)].collect().head
      assert(streamed == batch,
        s"stream/batch violation counts diverged: $streamed vs $batch")
      // and the counts are the planted ones: 6 rows; 1 null; 1 range
      // (500.0 and -3.0 → 2); regex: BAD → 1 (null exempt)
      assert(batch == ((6L, 1L, 2L, 1L)))
    } finally q.stop()
  }
}
