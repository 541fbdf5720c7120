package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KeepBestSpec extends SparkSpec {
  import spark.implicits._

  test("keepBestByKey matches brute force: max score, tie least id") {
    // seeded data with deliberate score ties inside keys
    val rows = (0 until 200).map { i =>
      (i.toLong, s"k${i % 7}", (i * 13 % 5).toDouble, s"payload$i")
    }
    val df = rows.toDF("id", "key", "score", "payload")
    val got = Dedup.keepBestByKey(df, "key", "score", "id")
      .collect().map(r => (r.getString(1), r.getLong(0), r.getString(3)))
      .sortBy(_._1)
    val want = rows.groupBy(_._2).map { case (k, g) =>
      val w = g.minBy(t => (-t._3, t._1))
      (k, w._1, w._4)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == want)
  }

  test("keepBestByKey preserves every column of the winner row") {
    val df = Seq((1L, "a", 2.0, "x", 42), (2L, "a", 3.0, "y", 43))
      .toDF("id", "key", "score", "s", "n")
    val w = Dedup.keepBestByKey(df, "key", "score", "id").collect().head
    assert(w.getLong(0) == 2L && w.getString(3) == "y" && w.getInt(4) == 43)
  }

  test("plan shape: one exchange, no window") {
    val df = Seq((1L, "a", 2.0)).toDF("id", "key", "score")
    val plan = Dedup.keepBestByKey(df, "key", "score", "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    assert(plan.split("Exchange").length - 1 == 1)
  }

  test("dropNearDuplicatesKeepBest keeps the best-scoring member per cluster") {
    val docs = Seq(
      (1L, 5.0), (2L, 9.0), (3L, 7.0), // cluster {1,2,3} via (1,2),(2,3)
      (4L, 1.0) // unpaired — passes through
    ).toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.dropNearDuplicatesKeepBest(docs, pairs, "doc_id", "q")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L))
  }

  test("with score = -id, keep-best equals the least-id transitive policy") {
    val docs = (1L to 20L).map(i => (i, -i.toDouble)).toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (10L, 11L), (11L, 12L))
      .toDF("id_a", "id_b")
    val a = Dedup.dropNearDuplicatesKeepBest(docs, pairs, "doc_id", "q")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Dedup.dropNearDuplicatesTransitive(docs, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }
}
