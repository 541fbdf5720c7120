package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.quality.Profiling

/** Sketch properties that the exact-replay gates can't express: the
  * distributed-merge contract (sketch of a union ≡ merge of the shard
  * sketches — what makes these usable across 1000 executors / daily
  * snapshots), the CMS one-sided error guarantee, and the profiling
  * audits' analytical invariants.
  */
class SketchesSpec extends SparkSpec {

  private lazy val orders = Tables.orders(spark, sfDir)
  private lazy val left = orders.where(col("o_orderkey") % 2 === 0)
  private lazy val right = orders.where(col("o_orderkey") % 2 =!= 0)

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|"))

  test("HLL: merge of shard sketches equals the sketch of the union") {
    val whole = Sketches.hllRegisters(orders, col("o_custkey"), "hmg")
    val merged = Sketches.hllMerge(
      Sketches.hllRegisters(left, col("o_custkey"), "hmg"),
      Sketches.hllRegisters(right, col("o_custkey"), "hmg"))
    assert(sortedRows(merged).sameElements(sortedRows(whole)))
  }

  test("HLL: merge is idempotent (register max)") {
    val a = Sketches.hllRegisters(orders, col("o_custkey"), "hid")
    assert(sortedRows(Sketches.hllMerge(a, a)).sameElements(sortedRows(a)))
  }

  test("HLL: estimate lands within 4 standard errors of the truth") {
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(orders, col("o_custkey"), "hll"))
      .head().getAs[Double]("estimate")
    val exact = orders.select(countDistinct(col("o_custkey")))
      .head().getLong(0).toDouble
    val se = 1.04 / math.sqrt(512.0) // Flajolet et al. §4
    assert(math.abs(est - exact) / exact <= 4 * se,
      s"estimate $est vs exact $exact")
  }

  test("CMS: estimates never undercount, and merge adds counts") {
    val probes = orders.select(col("o_custkey")).distinct().limit(50)
    val whole = Sketches.cmsSketch(orders, col("o_custkey"), "cm")
    val merged = Sketches.cmsMerge(
      Sketches.cmsSketch(left, col("o_custkey"), "cm"),
      Sketches.cmsSketch(right, col("o_custkey"), "cm"))
    assert(sortedRows(merged).sameElements(sortedRows(whole)))
    val joined = Sketches.cmsEstimate(whole, probes, col("o_custkey"), "cm")
      .join(orders.groupBy(col("o_custkey").as("key"))
        .agg(count(lit(1)).as("true_cnt")), Seq("key"))
      .select(col("cms_count") >= col("true_cnt")).collect()
    assert(joined.nonEmpty && joined.forall(_.getBoolean(0)))
  }

  test("grouped HLL: per-group registers equal per-group standalone sketches") {
    import graft.core.Tables
    val ev = Tables.events(spark, sfDir)
    val grouped = Sketches.hllGroupedRegisters(ev,
      col("event_type"), col("user_id"), "ghll")
    val types = ev.select(col("event_type")).distinct()
      .collect().map(_.getString(0))
    types.foreach { t =>
      val solo = sortedRows(Sketches.hllRegisters(
        ev.where(col("event_type") === t), col("user_id"), "ghll"))
      val slice = sortedRows(grouped.where(col("g") === t)
        .select(col("register"), col("rank")))
      assert(slice.sameElements(solo), s"group $t diverged")
    }
  }

  test("Benford: digit shares sum to 1 and chi2 terms are non-negative") {
    val rows = Profiling.benfordReport(orders, col("o_totalprice")).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSet.subsetOf((1 to 9).toSet))
    val pSum = rows.map(_.getAs[Double]("observed_p")).sum
    assert(pSum ~== (1.0, 1e-4))
    assert(rows.forall(_.getAs[Double]("chi2_term") >= 0.0))
  }

  test("key-skew report flags a hot key") {
    import spark.implicits._
    val hot = (1 to 900).map(_ => "hot") ++ (1 to 100).map(i => s"k$i")
    val rep = Profiling.keySkewReport(hot.toDF("k"), col("k")).head()
    assert(rep.getAs[Long]("n_keys") === 101L)
    assert(rep.getAs[Long]("max_cnt") === 900L)
    assert(rep.getAs[Double]("skew_factor") >= 100.0)
    assert(rep.getAs[Double]("top_key_share") ~== (0.9, 1e-6))
  }
}
