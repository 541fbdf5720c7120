package graft.datasets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Ref: dask_ml.datasets (datasets.py:26-462): synthetic generators.
  *
  * Draw scheme: every per-row random draw comes from the md5 stream
  * `u(seed, tag, i, j) = md5("seed|tag|i|j")[first 15 hex] / 2^60` —
  * a pure function of (seed, row id), NEVER of the partitioning. Two
  * properties follow:
  *
  *  1. bit-determinism across repartitioning/scale-out (the
  *     per-partition `java.util.Random(seed + pid)` scheme this
  *     replaces changed values whenever nPartitions changed);
  *  2. the DuckDB oracle reproduces every draw bit-for-bit
  *     (`('0x' || substr(md5(...), 1, 15))::BIGINT / 2^60`), so the
  *     generator gates are hash-EXACT, not rows-only: gaussians via
  *     Box-Muller (sqrt/ln/cos agree across libms to ~1 ulp; all gate
  *     comparisons quantize to 6 dp first), Poisson via the
  *     exponential-arrivals form with 6-dp-quantized comparisons.
  *
  * Generation stays embarrassingly parallel at any scale (the
  * reference vstacks per-chunk delayed sklearn calls; here each row is
  * an independent pure function of its id).
  */
object Datasets {

  private def partitioned(spark: SparkSession, nSamples: Long, nPartitions: Int) =
    spark.range(0, nSamples, 1, nPartitions).rdd

  /** MessageDigest is not thread-safe; one per executor thread. */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val Two60 = (1L << 60).toDouble

  /** First 60 bits of md5("seed|tag|i|j") — equals parsing the first
    * 15 hex chars, the same truncation the dedup/simhash family uses.
    */
  private def h60(seed: Long, tag: String, i: Long, j: Long): Long = {
    val bytes = md5Local.get().digest(s"$seed|$tag|$i|$j".getBytes("UTF-8"))
    var h = 0L
    var b = 0
    while (b < 8) { h = (h << 8) | (bytes(b) & 0xffL); b += 1 }
    h >>> 4
  }

  /** Uniform in [0, 1). */
  private[graft] def mdU(seed: Long, tag: String, i: Long, j: Long): Double =
    h60(seed, tag, i, j).toDouble / Two60

  /** Uniform in (0, 1] — safe under ln. */
  private[graft] def mdUPos(seed: Long, tag: String, i: Long, j: Long): Double =
    (h60(seed, tag, i, j) + 1).toDouble / Two60

  /** Standard normal via Box-Muller over draws (2j, 2j+1) of `tag`. */
  private[graft] def mdGauss(seed: Long, tag: String, i: Long, j: Int): Double =
    math.sqrt(-2.0 * math.log(mdUPos(seed, tag, i, 2L * j))) *
      math.cos(2.0 * math.Pi * mdU(seed, tag, i, 2L * j + 1))

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---- DuckDB oracle-side SQL for the SAME draw streams ------------

  /** SQL for [[mdU]] / [[mdUPos]]; `i` and `j` are SQL fragments. */
  def sqlU(seed: Long, tag: String, i: String, j: String): String =
    s"(('0x' || substr(md5('$seed|$tag|' || $i || '|' || $j), 1, 15))::BIGINT" +
      " / 1152921504606846976.0)"
  def sqlUPos(seed: Long, tag: String, i: String, j: String): String =
    s"((('0x' || substr(md5('$seed|$tag|' || $i || '|' || $j), 1, 15))::BIGINT + 1)" +
      " / 1152921504606846976.0)"

  /** SQL for [[mdGauss]] (same Box-Muller formula, term for term). */
  def sqlGauss(seed: Long, tag: String, i: String, j: Int): String =
    s"(sqrt(-2 * ln(${sqlUPos(seed, tag, i, (2 * j).toString)})) * " +
      s"cos(2 * pi() * ${sqlU(seed, tag, i, (2 * j + 1).toString)}))"

  // ---- driver-side weight draws ------------------------------------
  // These stay java.util.Random: they are a handful of per-dataset
  // constants computed on the driver and inlined as literals into the
  // oracle SQL, so engine reproducibility is irrelevant.

  def countsWeights(seed: Long, nFeatures: Int): Array[Double] = {
    val r = new scala.util.Random(seed)
    Array.fill(nFeatures)(r.nextGaussian() / math.sqrt(nFeatures))
  }

  def classificationWeights(seed: Long, nFeatures: Int): Array[Double] = {
    val r = new scala.util.Random(seed)
    Array.fill(nFeatures)(r.nextGaussian())
  }

  def regressionWeights(seed: Long, nFeatures: Int, nInformative: Int): Array[Double] = {
    val r = new scala.util.Random(seed)
    Array.tabulate(nFeatures)(j =>
      if (j < nInformative) r.nextDouble() * 100 else 0.0)
  }

  /** datasets.py:78-206 make_blobs: k isotropic gaussian clusters.
    * Centers are deterministic from the seed; labels round-robin.
    */
  def makeBlobs(spark: SparkSession, nSamples: Long = 10000, nFeatures: Int = 2,
      centers: Int = 3, clusterStd: Double = 1.0, seed: Long = 42,
      nPartitions: Int = 8): DataFrame = {
    val centerRnd = new scala.util.Random(seed)
    val ctrs = Array.fill(centers, nFeatures)(centerRnd.nextDouble() * 20 - 10)
    val rdd = partitioned(spark, nSamples, nPartitions).map { i =>
      val c = (i % centers).toInt
      val xs = Array.tabulate(nFeatures)(j =>
        ctrs(c)(j) + mdGauss(seed, "b", i, j) * clusterStd)
      Row.fromSeq(xs.toSeq :+ c)
    }
    val schema = StructType((0 until nFeatures).map(j =>
      StructField(s"x$j", DoubleType)) :+ StructField("label", IntegerType))
    spark.createDataFrame(rdd, schema)
  }

  /** datasets.py:208-341 make_regression: y = Xw + b + noise with a
    * deterministic sparse-ish weight vector.
    */
  def makeRegression(spark: SparkSession, nSamples: Long = 10000,
      nFeatures: Int = 5, nInformative: Int = 3, noise: Double = 0.0,
      bias: Double = 0.0, seed: Long = 42, nPartitions: Int = 8): DataFrame = {
    val w = regressionWeights(seed, nFeatures, nInformative)
    val rdd = partitioned(spark, nSamples, nPartitions).map { i =>
      val xs = Array.tabulate(nFeatures)(j => mdGauss(seed, "x", i, j))
      var y = bias
      var j = 0
      while (j < nFeatures) { y += xs(j) * w(j); j += 1 }
      if (noise > 0) y += mdGauss(seed, "n", i, 0) * noise
      Row.fromSeq(xs.toSeq :+ y)
    }
    val schema = StructType((0 until nFeatures).map(j =>
      StructField(s"x$j", DoubleType)) :+ StructField("y", DoubleType))
    spark.createDataFrame(rdd, schema)
  }

  /** datasets.py:26-77 make_counts: Poisson-distributed target
    * y ~ Poisson(exp(X·w)) — the generator for Poisson-regression
    * tests. Sampler: the exponential-arrivals form of Knuth's method,
    * y = #{k ≤ 50 : Σ_{d≤k} −ln(u_d) ≤ λ}, with BOTH sides of the
    * comparison quantized to 6 dp so the DuckDB oracle reproduces the
    * integer count exactly (a raw float compare would flip on ~1-ulp
    * libm differences). The k ≤ 50 cap is part of the sampler's
    * semantics (λ = exp(x·w) with ‖w‖ ≈ 1 keeps λ ≪ 50; a capped row
    * caps identically on both engines).
    */
  def makeCounts(spark: SparkSession, nSamples: Long = 10000,
      nFeatures: Int = 5, seed: Long = 42, nPartitions: Int = 8): DataFrame = {
    val w = countsWeights(seed, nFeatures)
    val rdd = partitioned(spark, nSamples, nPartitions).map { i =>
      val xs = Array.tabulate(nFeatures)(j => mdGauss(seed, "x", i, j))
      var margin = 0.0
      var j = 0
      while (j < nFeatures) { margin += xs(j) * w(j); j += 1 }
      val lam6 = r6(math.exp(margin))
      var cum = 0.0
      var k = 0
      var d = 1
      while (d <= MaxPoissonDraws) {
        cum += -math.log(mdUPos(seed, "p", i, d))
        if (r6(cum) <= lam6) k += 1 // cum is increasing: count == max prefix
        d += 1
      }
      Row.fromSeq(xs.toSeq :+ k.toLong)
    }
    val schema = StructType((0 until nFeatures).map(j =>
      StructField(s"x$j", DoubleType)) :+ StructField("y", LongType))
    spark.createDataFrame(rdd, schema)
  }

  val MaxPoissonDraws = 50

  /** datasets.py:391-462 make_classification_df: make_classification as
    * a named-column DataFrame plus a uniformly random DATE column in
    * [startDate, endDate] (the reference's random_date,
    * datasets.py:384-389). The date offset `floor(u * (days+1))` is one
    * exact IEEE multiply of a bit-exact uniform — reproduced
    * bit-for-bit by the oracle.
    */
  def makeClassificationDf(spark: SparkSession, nSamples: Long = 10000,
      nFeatures: Int = 5, flipY: Double = 0.01, seed: Long = 42,
      startDate: String = "2020-01-01", endDate: String = "2021-01-01",
      nPartitions: Int = 8): DataFrame = {
    val start = java.time.LocalDate.parse(startDate)
    val days = java.time.temporal.ChronoUnit.DAYS.between(
      start, java.time.LocalDate.parse(endDate))
    require(days >= 0, s"endDate $endDate before startDate $startDate")
    val w = classificationWeights(seed, nFeatures)
    val fy = flipY
    val rdd = partitioned(spark, nSamples, nPartitions).map { i =>
      val (xs, label) = classificationRow(seed, nFeatures, fy, w, i)
      val off = math.floor(mdU(seed, "d", i, 0) * (days + 1)).toInt
      Row.fromSeq(xs.toSeq :+ label :+ java.sql.Date.valueOf(start.plusDays(off)))
    }
    val schema = StructType((0 until nFeatures).map(j =>
      StructField(s"x$j", DoubleType)) :+ StructField("label", DoubleType)
      :+ StructField("date", DateType))
    spark.createDataFrame(rdd, schema)
  }

  private def classificationRow(seed: Long, nFeatures: Int, flipY: Double,
      w: Array[Double], i: Long): (Array[Double], Double) = {
    val xs = Array.tabulate(nFeatures)(j => mdGauss(seed, "x", i, j))
    var margin = 0.0
    var j = 0
    while (j < nFeatures) { margin += xs(j) * w(j); j += 1 }
    val label0 = if (margin > 0) 1.0 else 0.0
    val label = if (mdU(seed, "f", i, 0) < flipY) 1.0 - label0 else label0
    (xs, label)
  }

  /** datasets.py:343-389 make_classification: two-class linear boundary
    * with gaussian features and optional label noise.
    */
  def makeClassification(spark: SparkSession, nSamples: Long = 10000,
      nFeatures: Int = 5, flipY: Double = 0.01, seed: Long = 42,
      nPartitions: Int = 8): DataFrame = {
    val w = classificationWeights(seed, nFeatures)
    val fy = flipY
    val rdd = partitioned(spark, nSamples, nPartitions).map { i =>
      val (xs, label) = classificationRow(seed, nFeatures, fy, w, i)
      Row.fromSeq(xs.toSeq :+ label)
    }
    val schema = StructType((0 until nFeatures).map(j =>
      StructField(s"x$j", DoubleType)) :+ StructField("label", DoubleType))
    spark.createDataFrame(rdd, schema)
  }
}
