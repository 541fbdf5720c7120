package graft.relational

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {

  test("saltedInnerJoin: identical results to the plain join on skewed keys") {
    import spark.implicits._
    // heavy skew: one key carries 90% of the left side
    val left = (Seq.fill(9000)(1L) ++ (2L to 1001L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val right = (1L to 1001L).map(k => (k, s"r$k")).toDF("rk", "payload")
    val plain = left.join(right, left("k") === right("rk"))
      .select("k", "v", "payload")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", "rk", saltFactor = 8)
      .select("k", "v", "payload")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain)
    assert(salted.count(_._1 == 1L) == 9000)
    // deterministic (hash salt, not rand): re-run matches
    val again = SkewJoin.saltedInnerJoin(left, right, "k", "rk", saltFactor = 8)
      .select("k", "v", "payload").as[(Long, Long, String)].collect().sorted.toSeq
    assert(again == salted)
  }

  test("bucketed tables join without a shuffle exchange") {
    val tmp = java.nio.file.Files.createTempDirectory("graftbuckets")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val orders = Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_totalprice")
      val li = Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_quantity")
      Bucketing.writeBucketed(
        orders.withColumn("k", col("o_orderkey")), "b_orders", "k", 4,
        Some(s"$tmp/orders"))
      Bucketing.writeBucketed(
        li.withColumn("k", col("l_orderkey")), "b_lineitem", "k", 4,
        Some(s"$tmp/lineitem"))
      val joined = Bucketing.readBucketed(spark, "b_orders")
        .join(Bucketing.readBucketed(spark, "b_lineitem"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == li.count()) // every lineitem has its order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
    }
  }

  test("AQE splits the skewed join partition (skew=true in the adaptive plan)") {
    import spark.implicits._
    val prev = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    def restore(): Unit = prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // make the hot partition count as skewed at toy scale
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // one key carries ~95% of the left side, with a fat payload so the
      // hot partition crosses the byte threshold
      val pad = "x" * 64
      val left = (Seq.fill(20000)(1L) ++ (2L to 1001L)).zipWithIndex
        .map { case (k, i) => (k, i.toLong, pad) }.toDF("k", "v", "pad")
      val right = (1L to 1001L).map(k => (k, s"r$k")).toDF("rk", "payload")
      val joined = left.join(right, col("k") === col("rk"))
      // execute THIS dataframe (count() would plan a separate query and
      // leave joined's adaptive plan unfinalized)
      assert(joined.collect().length == 20000 + 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join:\n$plan")
    } finally restore()
  }

  test("bloomFilteredJoin: identical results to the plain join; no false negatives") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val big = Seq.tabulate(5000)(i => (rnd.nextInt(2000).toLong, i.toLong))
      .toDF("bk", "bv")
    val small = (1L to 100L).map(k => (k * 7, s"s$k")).toDF("sk", "payload")
    val plain = big.join(small, col("bk") === col("sk"))
      .select("bk", "bv", "payload")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val bloomed = BloomJoin.bloomFilteredJoin(big, small, "bk", "sk",
        expectedItems = 1000L)
      .select("bk", "bv", "payload")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(bloomed == plain)
    // the pre-filter keeps every true match (no false negatives) and,
    // with 100 keys out of 2000, screens out most of the big side
    val pre = BloomJoin.bloomSemiFilter(big, small, "bk", "sk", 1000L).count()
    val trueMatches = plain.size
    assert(pre >= trueMatches)
    assert(pre < 5000, s"pre-filter kept everything ($pre rows)")
  }
}
