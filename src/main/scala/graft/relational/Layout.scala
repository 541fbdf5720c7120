package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Space-filling-curve data layout — the 100 TB FILE-SKIPPING lever.
  *
  * Sorting a table on one column lets min/max footer stats prune
  * files for predicates on THAT column only; a predicate on any other
  * column scans everything. Interleaving the bits of several columns
  * into one Z-order (Morton) key and range-partitioning on it bounds
  * EVERY interleaved dimension within each file — a multi-dimensional
  * predicate prunes on all of them at once (Morton 1966; the
  * technique behind OPTIMIZE ZORDER BY in public lakehouse engines).
  *
  * Everything here is pure integer Column arithmetic — codegen'd,
  * scan-fused, shuffle-free; the only shuffle in [[zOrdered]] is the
  * single range-partition that IS the layout being produced.
  */
object Layout {

  /** Morton key: interleave the low `bits` bits of each column —
    * column 0 owns bit positions ≡ 0 (mod d), column 1 positions ≡ 1,
    * …; values are masked to `bits` first (callers pick `bits` to
    * cover their domain; re-layout widens it). bits · #cols ≤ 62 keeps
    * the key in a non-negative BIGINT.
    */
  def zOrderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zOrderKey needs at least one column")
    require(bits > 0 && bits * cols.size <= 62,
      s"bits * cols must fit a signed 64-bit key, got $bits * ${cols.size}")
    val d = cols.size
    val mask = (1L << bits) - 1
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long").bitwiseAND(lit(mask)), i)
      .bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The same key as ANSI SQL over BIGINT shifts/masks — the oracle
    * mirror (DuckDB `&`/`|`/`<<`/`>>` semantics match Spark's on
    * non-negative values, which the mask guarantees).
    */
  def zOrderKeySql(cols: Seq[String], bits: Int): String = {
    val d = cols.size
    val mask = (1L << bits) - 1
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield s"((((CAST($c AS BIGINT) & $mask) >> $i) & 1) << ${i * d + j})"
    terms.mkString("(", " | ", ")")
  }

  /** Attach `__zorder`: each dimension min-max scaled to the FULL
    * `bits`-bit range first (raw domains rarely fill their bit width;
    * unscaled, the curve's high bits sit constant and interleaving
    * degenerates to sorting by one column), then interleaved. Bounds
    * come from one tiny aggregate (2·d values) broadcast back — never
    * collected. Scaling is floor(double/double) on exactly-representable
    * integers (< 2^47), the house cross-engine-deterministic division.
    */
  private def withScaledKey(df: DataFrame, cols: Seq[String],
      bits: Int): DataFrame = {
    val mask = (1L << bits) - 1
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).cast("long").as(s"__mn_$c"),
      max(col(c)).cast("long").as(s"__mx_$c")))
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val scaled = cols.map { c =>
      val mn = col(s"__mn_$c"); val mx = col(s"__mx_$c")
      when(mx > mn,
        floor(((col(c).cast("long") - mn) * mask).cast("double") /
          (mx - mn).cast("double")).cast("long"))
        .otherwise(lit(0L))
    }
    df.crossJoin(broadcast(bounds))
      .withColumn("__zorder", zOrderKey(scaled, bits))
      .drop(cols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c")): _*)
  }

  /** The scaled key as SQL, GENERATED from the same (cols, bits) — the
    * oracle mirror of [[withScaledKey]]. Emits the interleave over
    * per-column CASE/floor scaling; expects a 1-row `b` relation in
    * scope with `mn_i`/`mx_i` columns (see the gate's bounds CTE).
    */
  def zOrderScaledSql(cols: Seq[String], bits: Int): String = {
    val mask = (1L << bits) - 1
    val scaled = cols.zipWithIndex.map { case (c, i) =>
      s"""CASE WHEN mx_$i > mn_$i THEN CAST(floor(
         |  CAST((CAST($c AS BIGINT) - mn_$i) * $mask AS DOUBLE)
         |  / CAST(mx_$i - mn_$i AS DOUBLE)) AS BIGINT) ELSE 0 END"""
        .stripMargin.replace("\n", " ")
    }
    zOrderKeySql(scaled, bits)
  }

  /** Lay a frame out along the curve: scale + key, then one
    * range-partition shuffle on the Morton key (Spark samples split
    * points, so output files are size-balanced even under skew), rows
    * curve-ordered within each partition so parquet row-group stats
    * are tight too. Write the result with any sink; each file's
    * min/max footer then bounds every interleaved column.
    */
  def zOrdered(df: DataFrame, cols: Seq[String], bits: Int,
      numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    withScaledKey(df, cols, bits)
      .repartitionByRange(numFiles, col("__zorder"))
      .sortWithinPartitions("__zorder")
      .drop("__zorder")
  }

  /** Skipping report: bucket rows by the TOP `bucketBits` of the
    * scaled key (fixed-width quad-tree cells — deterministic, no
    * sampled split points, so an independent engine reproduces it
    * exactly) and report each bucket's per-dimension bounding box —
    * the min/max stats a file would carry under this layout.
    * |buckets| rows out.
    */
  def zOrderBucketStats(df: DataFrame, cols: Seq[String], bits: Int,
      bucketBits: Int): DataFrame = {
    val keyed = zBucketed(df, cols, bits, bucketBits)
    val aggs = count(lit(1)).as("n") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    keyed.groupBy(col("zbucket").as("bucket")).agg(aggs.head, aggs.tail: _*)
  }

  /** Attach the fixed-width curve CELL id (`zbucket` = top `bucketBits`
    * of the scaled Morton key) to every row — the deterministic
    * DIRECTORY-layout form of [[zOrdered]]: partitioning the write on
    * `zbucket` gives each output directory a bounded box in EVERY
    * interleaved dimension (quad-tree cells, no sampled split points),
    * so a multi-dimensional predicate prunes whole directories before
    * parquet footers are even consulted. Feed it to a partitioned sink
    * (e.g. Sinks.writeShards with shardCol = "zbucket").
    */
  def zBucketed(df: DataFrame, cols: Seq[String], bits: Int,
      bucketBits: Int): DataFrame = {
    require(bucketBits > 0 && bucketBits <= bits * cols.size,
      s"bucketBits must be in (0, ${bits * cols.size}], got $bucketBits")
    withScaledKey(df, cols, bits)
      .withColumn("zbucket",
        shiftright(col("__zorder"), bits * cols.size - bucketBits))
      .drop("__zorder")
  }
}
