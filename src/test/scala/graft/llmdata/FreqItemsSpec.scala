package graft.llmdata

import graft.SparkSpec
import graft.functions.FreqItems
import org.apache.spark.sql.functions._

/** Misra–Gries guarantees that must hold REGARDLESS of partitioning /
  * merge order: heavy hitters (freq > n/(k+1)) always present, reported
  * counts are lower bounds within n/(k+1) of exact, and when k ≥
  * distinct-count the summary is exact.
  */
class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  private def mg(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    df.agg(FreqItems(col("item"), k).as("f"))
      .select(explode(col("f")).as("e"))
      .select("e.item", "e.count").as[(String, Long)].collect().toMap

  test("heavy hitters survive any partitioning; counts are bounded underestimates") {
    // skewed stream: "hot" 4000x, "warm" 900x, 200 rare items 10x each
    val rows = Seq.fill(4000)("hot") ++ Seq.fill(900)("warm") ++
      (0 until 200).flatMap(i => Seq.fill(10)(s"rare_$i"))
    val n = rows.size
    val k = 6
    val slack = n.toDouble / (k + 1) // ~986
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (nPart <- Seq(1, 4, 17)) {
      val out = mg(rows.toDF("item").repartition(nPart), k)
      assert(out.contains("hot"), s"nPart=$nPart: heavy hitter evicted")
      out.foreach { case (item, lb) =>
        assert(lb <= exact(item), s"$item overcounted: $lb > ${exact(item)}")
        assert(lb >= exact(item) - slack, s"$item undercounted past bound")
      }
      assert(out.size <= k)
    }
  }

  test("exact when k >= distinct count, sorted count desc then item") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(1)("d")).toDF("item").repartition(3)
    val rows = df.agg(FreqItems(col("item"), 10).as("f"))
      .select(explode(col("f")).as("e"))
      .select("e.item", "e.count").as[(String, Long)].collect().toSeq
    assert(rows == Seq(("a", 5L), ("b", 3L), ("c", 3L), ("d", 1L)))
  }

  test("heavyTokens pipeline: explode -> MG -> long form") {
    val docs = Seq((1L, "x x x y"), (2L, "x y z")).toDF("doc_id", "text")
    val out = TextStats.heavyTokens(docs, "text", k = 10)
      .as[(String, Long)].collect().toMap
    assert(out == Map("x" -> 4L, "y" -> 2L, "z" -> 1L))
  }
}
