package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EntityResolutionSpec extends SparkSpec {

  import spark.implicits._

  test("fuzzyPairs: only in-block pairs within the edit budget, id_a < id_b") {
    val df = Seq(
      (1L, "smith", 1), (2L, "smyth", 1), (3L, "smith", 2),
      (4L, "jones", 1), (5L, "jonas", 1), (6L, "wildly-different", 1))
      .toDF("id", "name", "blk")
    val pairs = EntityResolution.fuzzyPairs(df, "id", "name", col("blk"),
      maxDistance = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(4)))
    // (1,2) smith~smyth d=1; (4,5) jones~jonas d=1. (1,3) identical but
    // different blocks -> excluded by blocking, the documented trade-off.
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L), (4L, 5L)))
    assert(pairs.forall(_._3 <= 1))
    assert(pairs.forall(p => p._1 < p._2))
  }

  test("fuzzyPairs: identical strings pair at distance 0") {
    val df = Seq((1L, "abc", 1), (2L, "abc", 1)).toDF("id", "name", "blk")
    val p = EntityResolution.fuzzyPairs(df, "id", "name", col("blk"), 2)
      .collect()
    assert(p.length == 1 && p.head.getInt(4) == 0)
  }

  test("fuzzyPairs: length guard never drops a within-budget pair") {
    // lengths differ by exactly maxDistance — must survive the guard
    val df = Seq((1L, "abcd", 1), (2L, "abc", 1)).toDF("id", "name", "blk")
    val p = EntityResolution.fuzzyPairs(df, "id", "name", col("blk"), 1)
      .collect()
    assert(p.length == 1 && p.head.getInt(4) == 1)
  }
}
