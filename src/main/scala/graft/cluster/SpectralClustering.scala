package graft.cluster

import breeze.linalg.{diag, pinv, svd, DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Estimator, Model}

/** Ref: dask_ml.cluster.SpectralClustering (cluster/spectral.py:180-375)
  * — Nyström-approximate spectral clustering (Fowlkes et al. 2004):
  *
  *  1. sample m landmark rows (spectral.py:237-249);
  *  2. A = kernel(landmarks, landmarks) — m×m, driver/Breeze;
  *  3. B = kernel(rest, landmarks) — the distributed strip, computed as
  *     an m-wide kernel-vector column per row against the broadcast
  *     landmark matrix (a UDF: dense BLAS-ish loop per row; the
  *     reference's blockwise `pairwise_kernels`, spectral.py:250-262);
  *  4. degree-normalize A and B (Eq. 16), eigendecompose the small
  *     m×m system on the driver (scipy pinv/svd there, Breeze here,
  *     spectral.py:263-291);
  *  5. embed every row through the Nyström extension and k-means the
  *     embedding (our KMeans on the k embedding columns).
  *
  * Scale: one scan computes B and the degree sums (treeAggregate-style
  * partial sums); all m×m work is driver-side; the embedding is a
  * per-row map. m (nComponents) stays ≤ a few hundred — same contract
  * as the reference.
  */
class SpectralClustering(
    val featureCols: Seq[String],
    val nClusters: Int = 8,
    val nComponents: Int = 100,
    val gamma: Double = 1.0,
    val seed: Long = 42,
    val kmeansMaxIter: Int = 50,
    val predictionCol: String = "prediction"
) extends Estimator[SpectralClusteringModel] {

  private def rbf(x: Array[Double], y: Array[Double]): Double =
    graft.metrics.Pairwise.rbfLocal(x, y, gamma)

  def fit(df: DataFrame): SpectralClusteringModel = {
    val p = featureCols.size
    val data = df.select(featureCols.map(c => col(c).cast("double")): _*)

    // 1. landmarks: content-hash-ranked UNIFORM sample — deterministic
    // and independent of row order / partitioning (the same design as
    // Ann.ivfIndex; reference semantics: uniform choice without
    // replacement over all rows, spectral.py:180-230). The previous
    // `sample(frac).limit(n)` kept the first n sampled rows in SCAN
    // order, so on a sorted/clustered 100 TB corpus the Nyström basis
    // represented only the leading shard's distribution. nComponents is
    // ≤ a few hundred, so TakeOrderedAndProject keeps a bounded n-row
    // heap per partition and the driver merge is tiny — no count() (the
    // old code paid one) and no pre-filter needed at any corpus size.
    // Ties on the hash break by feature values: fully deterministic.
    val landmarks = data
      .withColumn("__h", xxhash64(lit(seed), array(featureCols.map(col): _*)))
      .orderBy(col("__h") +: featureCols.map(col): _*)
      .limit(nComponents)
      .select(featureCols.map(col): _*)
      .collect()
      .map(r => Array.tabulate(p)(r.getDouble))
    val m = landmarks.length
    require(m >= nClusters, s"need >= $nClusters landmarks, got $m")

    // 2. A (m×m) on the driver
    val a = BDM.tabulate(m, m)((i, j) => rbf(landmarks(i), landmarks(j)))

    // 3. kernel strip B as a column: per row, the m kernel values — a
    // native codegen expression (the landmark matrix rides as a
    // task-shared referenced object), not an interpreted UDF
    val withK = df.withColumn("__k", graft.functions.RbfKernelVec(
      array(featureCols.map(c => col(c).cast("double")): _*), landmarks, gamma))

    // 4. degree estimates (Fowlkes Eq.16): d1 = A·1 + B·1 (landmark side
    // uses the full-data column sums of the strip); column sums of B via
    // one aggregate over the array column
    val sumExprs = (0 until m).map(i => sum(element_at(col("__k"), i + 1)).as(s"s$i"))
    val bColSums = withK.agg(sumExprs.head, sumExprs.tail: _*).head()
    val bRowSumForLandmarks = BDV.tabulate(m)(i => bColSums.getDouble(i))
    val aRowSums = BDV.tabulate(m)(i => breeze.linalg.sum(a(i, ::).t))
    // landmark degrees: their kernel row over the whole dataset is the
    // strip's column sums (includes the A part already when landmarks are
    // data rows — the strip covers all rows, so use column sums directly)
    val dLandmark = bRowSumForLandmarks
    // normalized Â = A / sqrt(d dᵀ)
    val ahat = BDM.tabulate(m, m)((i, j) =>
      a(i, j) / math.sqrt(dLandmark(i) * dLandmark(j)))
    // 5. small eigensystem: Â = U S Uᵀ; embedding map =
    // D^{-1/2}_row · B_row · U · S^{-1/2} per row (Nyström extension)
    val svd.SVD(u, s, _) = svd(ahat)
    val k = nClusters
    val uk = u(::, 0 until k) // m×k
    val sk = s(0 until k)
    val proj = BDM.tabulate(m, k)((i, j) => uk(i, j) / math.sqrt(math.max(sk(j), 1e-12)))
    val projRows = Array.tabulate(m)(i => Array.tabulate(k)(j => proj(i, j)))

    // per-row embedding: e = (B_row / sqrt(deg_row)) · proj, where
    // deg_row = Σ_j B_row(j) (row degree estimated through the strip) —
    // the NystromEmbed codegen matvec, fused with the kernel strip
    val embedded = withK.withColumn("__e",
      graft.functions.NystromEmbed(col("__k"), projRows)).drop("__k")
    val withCols = (0 until k).foldLeft(embedded)((d, j) =>
      d.withColumn(s"__e_$j", element_at(col("__e"), j + 1))).drop("__e")

    // 6. k-means on the embedding
    val km = new KMeans((0 until k).map(j => s"__e_$j"), nClusters,
      maxIter = kmeansMaxIter, seed = seed).fit(withCols)
    new SpectralClusteringModel(featureCols, landmarks, projRows, gamma,
      km, predictionCol)
  }
}

object SpectralClustering {
  /** The Nyström embedding map as pure column expressions from literal
    * landmarks + projection: e_j = (Σ_i k_i·proj(i)(j)) / sqrt(Σ_i k_i)
    * with k_i = rbf(x, landmark_i). Identical math to the model's UDF —
    * usable (and oracle-reproducible in SQL) when m·k is small enough to
    * inline; the UDF path handles landmark counts in the hundreds.
    */
  def embedExprs(featureCols: Seq[String], landmarks: Array[Array[Double]],
      proj: Array[Array[Double]], gamma: Double): Seq[org.apache.spark.sql.Column] = {
    val ks = landmarks.map(lm =>
      graft.metrics.Pairwise.rbfExpr(featureCols, lm, gamma))
    val deg = ks.reduce(_ + _)
    val k = proj(0).length
    (0 until k).map { j =>
      ks.zipWithIndex.map { case (kc, i) => kc * lit(proj(i)(j)) }
        .reduce(_ + _) / sqrt(greatest(deg, lit(1e-12)))
    }
  }
}

class SpectralClusteringModel(
    val featureCols: Seq[String],
    val landmarks: Array[Array[Double]],
    val projection: Array[Array[Double]],
    val gamma: Double,
    val kmeans: KMeansModel,
    val predictionCol: String
) extends Model {
  def transform(df: DataFrame): DataFrame = {
    val k = projection(0).length
    // kernel strip → degree-normalized matvec, both native codegen
    // expressions — one fused span per row, no interpreted lambdas
    val embedded = df.withColumn("__e",
      graft.functions.NystromEmbed(
        graft.functions.RbfKernelVec(
          array(featureCols.map(c => col(c).cast("double")): _*),
          landmarks, gamma),
        projection))
    val withCols = (0 until k).foldLeft(embedded)((d, j) =>
      d.withColumn(s"__e_$j", element_at(col("__e"), j + 1))).drop("__e")
    kmeans.transform(withCols).drop((0 until k).map(j => s"__e_$j"): _*)
  }
}
