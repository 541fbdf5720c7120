package graft.llmdata

import graft.SparkSpec
import graft.functions.TopKByScore
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded top-k aggregate must be row-for-row identical to the
  * `row_number().over(Window.partitionBy(g).orderBy(score desc, id))`
  * idiom it replaces (same ordering, same tie-break), independent of
  * input partitioning (map-side partial merge).
  */
class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  private def topK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("query_id")
      .agg(TopKByScore(col("score"), col("id"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "s")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("s.id").as("id"), col("s.score").as("score"))

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("query_id").orderBy(desc("score"), col("id"))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "id", "score")
  }

  private lazy val rows = {
    // deterministic scores with deliberate exact ties across ids
    val r = for (q <- 0 until 7; i <- 0 until 200)
      yield (q.toLong, i.toLong, ((i * 2654435761L + q) % 97).toDouble / 97.0)
    r.toDF("query_id", "id", "score")
  }

  test("matches the row_number window form exactly, any partitioning") {
    for (nPart <- Seq(1, 3, 13)) {
      val df = rows.repartition(nPart)
      val got = topK(df, 5).orderBy("query_id", "rank")
        .as[(Long, Int, Long, Double)].collect()
      val want = windowTopK(df, 5).orderBy("query_id", "rank")
        .as[(Long, Int, Long, Double)].collect()
      assert(got.toSeq == want.toSeq, s"nPart=$nPart")
    }
  }

  test("groups with fewer than k candidates return all of them, ranked") {
    val df = Seq((1L, 10L, 0.9), (1L, 11L, 0.7), (2L, 12L, 0.5))
      .toDF("query_id", "id", "score")
    val got = topK(df, 5).orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1, 10L, 0.9), (1L, 2, 11L, 0.7), (2L, 1, 12L, 0.5)))
  }

  test("string ids: tie-break ascending, survives serialize/merge") {
    val df = (for (i <- 0 until 50)
      yield (1L, f"doc_$i%03d", if (i % 10 == 0) 1.0 else 0.5))
      .toDF("query_id", "id", "score").repartition(7)
    val got = df.groupBy("query_id")
      .agg(TopKByScore(col("score"), col("id"), 3).as("nn"))
      .select(posexplode(col("nn")).as(Seq("pos", "s")))
      .select(col("s.id")).as[String].collect().toSeq
    assert(got == Seq("doc_000", "doc_010", "doc_020"))
  }

  test("sort-based aggregation fallback (serde-heavy path) agrees") {
    // ObjectHashAggregate is the normal path; disabling it forces
    // SortAggregate, which round-trips the typed buffers through
    // serialize/deserialize far more aggressively
    val key = "spark.sql.execution.useObjectHashAggregateExec"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val df = rows.repartition(5)
      val got = topK(df, 4).orderBy("query_id", "rank")
        .as[(Long, Int, Long, Double)].collect().toSeq
      val want = windowTopK(df, 4).orderBy("query_id", "rank")
        .as[(Long, Int, Long, Double)].collect().toSeq
      assert(got == want)
      // FreqItems through the same fallback
      val mg = (Seq.fill(100)("hot") ++ (1 to 30).map(i => s"r$i"))
        .toDF("item").repartition(7)
        .agg(graft.functions.FreqItems(col("item"), 3).as("f"))
        .select(explode(col("f")).as("e")).select("e.item", "e.count")
        .as[(String, Long)].collect()
      assert(mg.head._1 == "hot" && mg.head._2 >= 100 - (130 / 4))
    } finally spark.conf.set(key, prev)
  }

  test("null scores are excluded") {
    val df = Seq((1L, 10L, Some(0.4)), (1L, 11L, None), (1L, 12L, Some(0.8)))
      .toDF("query_id", "id", "score")
    val got = topK(df, 3).orderBy("rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1, 12L, 0.8), (1L, 2, 10L, 0.4)))
  }
}
