package graft.datasets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Ref: dask_ml.datasets (datasets.py:26-462): synthetic generators with
  * per-block seeds — here per-PARTITION seeds (seed + partition id), so
  * results are deterministic for a given partitioning and no generator
  * state crosses partitions; generation is embarrassingly parallel at
  * any scale (the reference vstacks per-chunk delayed sklearn calls).
  */
object Datasets {

  private def partitioned(spark: SparkSession, nSamples: Long, nPartitions: Int) =
    spark.range(0, nSamples, 1, nPartitions).rdd

  /** datasets.py:78-206 make_blobs: k isotropic gaussian clusters.
    * Centers are deterministic from the seed; labels round-robin.
    */
  def makeBlobs(spark: SparkSession, nSamples: Long = 10000, nFeatures: Int = 2,
      centers: Int = 3, clusterStd: Double = 1.0, seed: Long = 42,
      nPartitions: Int = 8): DataFrame = {
    val centerRnd = new scala.util.Random(seed)
    val ctrs = Array.fill(centers, nFeatures)(centerRnd.nextDouble() * 20 - 10)
    val rdd = partitioned(spark, nSamples, nPartitions).mapPartitionsWithIndex {
      case (pid, it) =>
        val rnd = new scala.util.Random(seed + 1 + pid)
        it.map { i =>
          val c = (i % centers).toInt
          val xs = Array.tabulate(nFeatures)(j => ctrs(c)(j) + rnd.nextGaussian() * clusterStd)
          Row.fromSeq(xs.toSeq :+ c)
        }
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
    val wRnd = new scala.util.Random(seed)
    val w = Array.tabulate(nFeatures)(j =>
      if (j < nInformative) wRnd.nextDouble() * 100 else 0.0)
    val rdd = partitioned(spark, nSamples, nPartitions).mapPartitionsWithIndex {
      case (pid, it) =>
        val rnd = new scala.util.Random(seed + 1 + pid)
        it.map { _ =>
          val xs = Array.fill(nFeatures)(rnd.nextGaussian())
          val y = xs.zip(w).map { case (x, wi) => x * wi }.sum + bias +
            (if (noise > 0) rnd.nextGaussian() * noise else 0.0)
          Row.fromSeq(xs.toSeq :+ y)
        }
    }
    val schema = StructType((0 until nFeatures).map(j =>
      StructField(s"x$j", DoubleType)) :+ StructField("y", DoubleType))
    spark.createDataFrame(rdd, schema)
  }

  /** datasets.py:26-77 make_counts: Poisson-distributed target
    * y ~ Poisson(exp(X·w)) — the generator for Poisson-regression tests.
    * Knuth's product-of-uniforms sampler per row (λ stays small by
    * scaling w down with the feature count).
    */
  def makeCounts(spark: SparkSession, nSamples: Long = 10000,
      nFeatures: Int = 5, seed: Long = 42, nPartitions: Int = 8): DataFrame = {
    val wRnd = new scala.util.Random(seed)
    val w = Array.fill(nFeatures)(wRnd.nextGaussian() / math.sqrt(nFeatures))
    val rdd = partitioned(spark, nSamples, nPartitions).mapPartitionsWithIndex {
      case (pid, it) =>
        val rnd = new scala.util.Random(seed + 1 + pid)
        it.map { _ =>
          val xs = Array.fill(nFeatures)(rnd.nextGaussian())
          val lam = math.exp(xs.zip(w).map { case (x, wi) => x * wi }.sum)
          // Knuth: count uniforms until their product drops below e^-λ
          val limit = math.exp(-lam)
          var k = 0; var p = 1.0
          while ({ p *= rnd.nextDouble(); p > limit }) k += 1
          Row.fromSeq(xs.toSeq :+ k.toLong)
        }
    }
    val schema = StructType((0 until nFeatures).map(j =>
      StructField(s"x$j", DoubleType)) :+ StructField("y", LongType))
    spark.createDataFrame(rdd, schema)
  }

  /** datasets.py:391-462 make_classification_df: make_classification as
    * a named-column DataFrame plus a uniformly random DATE column in
    * [startDate, endDate] (the reference's random_date,
    * datasets.py:384-389).
    */
  def makeClassificationDf(spark: SparkSession, nSamples: Long = 10000,
      nFeatures: Int = 5, flipY: Double = 0.01, seed: Long = 42,
      startDate: String = "2020-01-01", endDate: String = "2021-01-01",
      nPartitions: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = makeClassification(spark, nSamples, nFeatures, flipY, seed, nPartitions)
    val days = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(startDate), java.time.LocalDate.parse(endDate))
    require(days >= 0, s"endDate $endDate before startDate $startDate")
    // deterministic per-row uniform date via the seeded rand expression
    base.withColumn("date",
      date_add(to_date(lit(startDate)),
        floor(rand(seed) * (days + 1)).cast("int")))
  }

  /** datasets.py:343-389 make_classification: two-class linear boundary
    * with gaussian features and optional label noise.
    */
  def makeClassification(spark: SparkSession, nSamples: Long = 10000,
      nFeatures: Int = 5, flipY: Double = 0.01, seed: Long = 42,
      nPartitions: Int = 8): DataFrame = {
    val wRnd = new scala.util.Random(seed)
    val w = Array.fill(nFeatures)(wRnd.nextGaussian())
    val rdd = partitioned(spark, nSamples, nPartitions).mapPartitionsWithIndex {
      case (pid, it) =>
        val rnd = new scala.util.Random(seed + 1 + pid)
        it.map { _ =>
          val xs = Array.fill(nFeatures)(rnd.nextGaussian())
          val margin = xs.zip(w).map { case (x, wi) => x * wi }.sum
          val label0 = if (margin > 0) 1.0 else 0.0
          val label = if (rnd.nextDouble() < flipY) 1.0 - label0 else label0
          Row.fromSeq(xs.toSeq :+ label)
        }
    }
    val schema = StructType((0 until nFeatures).map(j =>
      StructField(s"x$j", DoubleType)) :+ StructField("label", DoubleType))
    spark.createDataFrame(rdd, schema)
  }
}
