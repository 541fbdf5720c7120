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
