package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ref: dask_ml.metrics.pairwise (metrics/pairwise.py:19-227):
  * `euclidean_distances`, `pairwise_distances_argmin_min`, the
  * rbf/linear/polynomial/sigmoid kernels and the `pairwise_kernels`
  * dispatcher.
  *
  * Spark-first shape: the reference computes X (distributed) vs Y
  * (small, in-memory) blockwise; here Y is a literal Array[Array[Double]]
  * baked into codegen'd column expressions — every distance/kernel
  * column is pure arithmetic fused into the scan (no UDF, no join, no
  * shuffle). At 100 TB this is a map-only stage; Y must stay small
  * (≲ thousands of rows), the same contract the reference imposes by
  * materializing Y on the workers.
  *
  * Two dual surfaces per operator:
  *  - Column builders (`*Expr`) for composing into other operators;
  *  - DataFrame ops adding `dist_j` / `k_j` columns, the public API.
  * Plus plain-JVM kernels (`*Local`) reused by driver-side math
  * (SpectralClustering's m×m landmark block).
  */
object Pairwise {

  // ---- column builders (distributed side) ----

  /** Squared L2 distance from the feature columns to a literal point. */
  def sqDistExpr(featureCols: Seq[String], y: Array[Double]): Column =
    featureCols.zipWithIndex.map { case (c, i) =>
      val d = col(c) - lit(y(i)); d * d
    }.reduce(_ + _)

  def euclideanExpr(featureCols: Seq[String], y: Array[Double]): Column =
    sqrt(sqDistExpr(featureCols, y))

  def dotExpr(featureCols: Seq[String], y: Array[Double]): Column =
    featureCols.zipWithIndex.map { case (c, i) => col(c) * lit(y(i)) }
      .reduce(_ + _)

  /** pairwise.py:142-151 rbf_kernel: exp(-γ‖x−y‖²). */
  def rbfExpr(featureCols: Seq[String], y: Array[Double], gamma: Double): Column =
    exp(sqDistExpr(featureCols, y) * lit(-gamma))

  /** pairwise.py:154-160 linear_kernel: x·y. */
  def linearExpr(featureCols: Seq[String], y: Array[Double]): Column =
    dotExpr(featureCols, y)

  /** pairwise.py:163-177 polynomial_kernel: (γ x·y + c₀)^d. */
  def polynomialExpr(featureCols: Seq[String], y: Array[Double],
      degree: Int, gamma: Double, coef0: Double): Column =
    pow(dotExpr(featureCols, y) * lit(gamma) + lit(coef0), degree)

  /** pairwise.py:180-198 sigmoid_kernel: tanh(γ x·y + c₀).
    *
    * Evaluated via the identity tanh(z) = (e^{2z}−1)/(e^{2z}+1) rather
    * than JVM `tanh`: `exp` is correctly rounded on both the JVM and the
    * SQL engines we verify against, so the exact float sequence is
    * reproducible bit-for-bit across engines (JVM `tanh` and an exp-based
    * mirror differ in the last ulp, which flips round-half-up at .5
    * boundaries). |z| > 20 saturates to ±1 — tanh(20) is 1.0 at double
    * precision — which also dodges exp overflow past z ≈ 354.
    */
  def sigmoidExpr(featureCols: Seq[String], y: Array[Double],
      gamma: Double, coef0: Double): Column = {
    val z = dotExpr(featureCols, y) * lit(gamma) + lit(coef0)
    val e2z = exp(z * lit(2.0))
    when(abs(z) > lit(20.0), signum(z))
      .otherwise((e2z - lit(1.0)) / (e2z + lit(1.0)))
  }

  /** L1 (cityblock) distance — pairwise_distances(metric="manhattan"). */
  def manhattanExpr(featureCols: Seq[String], y: Array[Double]): Column =
    featureCols.zipWithIndex.map { case (c, i) => abs(col(c) - lit(y(i))) }
      .reduce(_ + _)

  /** Cosine DISTANCE 1 − x·y/(‖x‖‖y‖) — pairwise_distances(metric="cosine"). */
  def cosineDistanceExpr(featureCols: Seq[String], y: Array[Double]): Column = {
    val xNorm = sqrt(featureCols.map(c => col(c) * col(c)).reduce(_ + _))
    val yNorm = math.sqrt(y.map(v => v * v).sum)
    lit(1.0) - dotExpr(featureCols, y) / (xNorm * lit(yNorm))
  }

  // ---- public DataFrame operators ----

  /** pairwise.py:50-70 euclidean_distances: one `dist_j` column per Y
    * row. Map-only; fused into the scan.
    */
  def euclideanDistances(df: DataFrame, featureCols: Seq[String],
      y: Array[Array[Double]], prefix: String = "dist_"): DataFrame =
    y.zipWithIndex.foldLeft(df) { case (d, (yr, j)) =>
      d.withColumn(s"$prefix$j", euclideanExpr(featureCols, yr))
    }

  /** pairwise.py:19-47 pairwise_distances_argmin_min: per row, the index
    * of the nearest Y row and that distance — `argmin` + `min_dist`
    * columns. First minimum on ties (np.argmin).
    */
  def pairwiseDistancesArgminMin(df: DataFrame, featureCols: Seq[String],
      y: Array[Array[Double]]): DataFrame = {
    val dists = y.map(sqDistExpr(featureCols, _))
    val arr = array(dists.toIndexedSeq: _*)
    df.withColumn("argmin", (array_position(arr, array_min(arr)) - 1).cast("int"))
      .withColumn("min_dist", sqrt(array_min(arr)))
  }

  /** pairwise.py:201-227 pairwise_kernels dispatcher: one `k_j` column
    * per Y row under the named metric.
    */
  def pairwiseKernels(df: DataFrame, featureCols: Seq[String],
      y: Array[Array[Double]], metric: String = "linear",
      gamma: Double = 1.0, degree: Int = 3, coef0: Double = 1.0,
      prefix: String = "k_"): DataFrame = {
    val mk: Array[Double] => Column = metric match {
      case "rbf" => rbfExpr(featureCols, _, gamma)
      case "linear" => linearExpr(featureCols, _)
      case "polynomial" | "poly" => polynomialExpr(featureCols, _, degree, gamma, coef0)
      case "sigmoid" => sigmoidExpr(featureCols, _, gamma, coef0)
      case "euclidean" => euclideanExpr(featureCols, _)
      case "manhattan" | "cityblock" => manhattanExpr(featureCols, _)
      case "cosine" => cosineDistanceExpr(featureCols, _)
      case other => throw new IllegalArgumentException(
        s"unknown pairwise metric $other; known: rbf, linear, polynomial, " +
          "sigmoid, euclidean, manhattan, cosine")
    }
    y.zipWithIndex.foldLeft(df) { case (d, (yr, j)) =>
      d.withColumn(s"$prefix$j", mk(yr))
    }
  }

  // ---- plain-JVM kernels (driver-side small blocks) ----

  def sqDistLocal(x: Array[Double], y: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < x.length) { val d = x(i) - y(i); s += d * d; i += 1 }
    s
  }

  def rbfLocal(x: Array[Double], y: Array[Double], gamma: Double): Double =
    math.exp(-gamma * sqDistLocal(x, y))
}
