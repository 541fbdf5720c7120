package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities for the join patterns that break at 100 TB:
  *
  *  - [[SkewJoin.saltedInnerJoin]]: a hot key concentrates its every
  *    row on one reducer in a hash join. Salting splits each big-side
  *    key across `saltFactor` reducers and replicates the (small) right
  *    side once per salt — identical join semantics, uniform tasks.
  *    (AQE's skew-join split handles moderate skew automatically;
  *    salting is the explicit fix when one key alone exceeds what a
  *    single split should hold.)
  *  - [[Bucketing]]: co-locate repeated joins/aggregations on a stable
  *    key by writing both sides bucketed into the same bucket count —
  *    subsequent equi-joins on the bucket key read co-partitioned data
  *    and skip the shuffle entirely.
  */
object SkewJoin {

  /** Inner equi-join where `left` may be arbitrarily skewed on
    * `leftKey` and `right` is the smaller side (replicated ×saltFactor;
    * it need not fit in a broadcast — if it does, just `broadcast()`).
    *
    * left gets a deterministic per-row salt in [0, saltFactor); right
    * is exploded once per salt value; the join key becomes (key, salt).
    * Row-level results are exactly those of `left.join(right, key)`.
    * The salt is derived from a hash of the whole left row (not
    * `rand()`, which breaks retried-task determinism).
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, saltFactor: Int = 16): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val salted = left.withColumn("__salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated,
      salted(leftKey) === replicated(rightKey) &&
        salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}

object Bucketing {

  /** Write `df` as a bucketed+sorted table; equi-joins and
    * aggregations between tables bucketed on the same key with the
    * same bucket count skip their shuffles (co-partitioned scans).
    * With `path` the table is external (data at `path`); otherwise it
    * lands in the session warehouse.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Read a previously bucketed table. */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}

/** Bloom-filter join pre-filtering — the semi-join reduction Spark's AQE
  * InjectRuntimeFilter applies automatically when statistics allow,
  * exposed as an explicit operator for the 100 TB shapes where the
  * planner can't see it (e.g. the small side is itself a subquery the
  * optimizer won't estimate). The bloom is built with ONE aggregation
  * over the small side's keys (TypedImperative, map-side partial merge),
  * broadcast as a single row, and applied as a scan-fused predicate on
  * the big side BEFORE its shuffle — only rows that might match pay
  * network. False positives (rate ~`fpp` of the sketch sizing) pass the
  * pre-filter and are discarded by the exact join that follows, so the
  * JOIN RESULT is exact; false negatives are impossible.
  */
object BloomJoin {

  import org.apache.spark.sql.graft.ExpressionBridge

  /** Build the small side's bloom as ONE aggregation (TypedImperative,
    * map-side partial merge) and collect the serialized sketch to the
    * driver — BOUNDED state (~1.2 MB per 10⁶ expected items), the same
    * class of driver summary as a model or centroid set. The sketch is
    * then a plan literal, so the big-side pre-filter is a scan-fused
    * constant predicate (`might_contain` demands a constant or scalar
    * subquery bloom — an attribute from a join fails analysis).
    */
  private def bloomBytes(small: DataFrame, smallKey: String,
      expectedItems: Long): Array[Byte] =
    small.agg(ExpressionBridge
      .bloomFilterAgg(xxhash64(col(smallKey)), expectedItems).as("__bf"))
      .head.getAs[Array[Byte]]("__bf")

  /** Inner equi-join of `big` ⋈ `small` with a bloom pre-filter on the
    * big side. Column names must be disjoint. `expectedItems` sizes the
    * sketch (overestimate is safe — more bits, same exactness). False
    * positives pass the pre-filter and are discarded by the exact join,
    * so the JOIN RESULT is exact; false negatives are impossible.
    */
  def bloomFilteredJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedItems: Long = 1000000L): DataFrame =
    bloomSemiFilter(big, small, bigKey, smallKey, expectedItems)
      .join(small, col(bigKey) === col(smallKey))

  /** The pre-filter alone (for composing with other join strategies). */
  def bloomSemiFilter(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedItems: Long = 1000000L): DataFrame =
    big.filter(ExpressionBridge.bloomMightContain(
      lit(bloomBytes(small, smallKey, expectedItems)),
      xxhash64(col(bigKey))))
}
