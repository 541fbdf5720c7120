package graft.cluster

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Estimator, Model}

/** Ref: dask_ml.cluster.KMeans (cluster/k_means.py:254-619).
  *
  * The reference's headline init, `init="k-means||"` (Bahmani 2012,
  * k_means.py:436-513), IS MLlib's default init — the fit delegates to
  * MLlib (assignment = broadcast centers + per-partition distance argmin;
  * update = treeAggregate partial sums, exactly the reference's
  * blockwise `_centers_dense` + `da.bincount` design). dask-ml's
  * `oversampling_factor` has no MLlib knob (MLlib fixes 2k per step);
  * `init_max_iter` maps to `initSteps`.
  *
  * Predict/transform are pure column expressions against literal centers
  * (k·p doubles) — codegen'd, shuffle-free, and oracle-reproducible.
  */
class KMeans(
    val featureCols: Seq[String],
    val nClusters: Int = 8,
    val init: String = "k-means||",
    val initMaxIter: Int = 2,
    val maxIter: Int = 300,
    val tol: Double = 1e-4,
    val seed: Long = 42,
    val predictionCol: String = "prediction"
) extends Estimator[KMeansModel] {

  def fit(df: DataFrame): KMeansModel = {
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("__features")
      .transform(df.select(featureCols.map(col): _*))
    val mlk = new org.apache.spark.ml.clustering.KMeans()
      .setK(nClusters)
      .setInitMode(if (init == "k-means||") "k-means||" else "random")
      .setInitSteps(math.max(initMaxIter, 1))
      .setMaxIter(maxIter)
      .setTol(tol)
      .setSeed(seed)
      .setFeaturesCol("__features")
    val m = mlk.fit(assembled)
    val centers = m.clusterCenters.map(_.toArray)
    val inertia = m.summary.trainingCost
    new KMeansModel(featureCols, centers, inertia, m.summary.numIter, predictionCol)
  }
}

/** Result of [[KMeans.fitLloydDeterministic]]: the final model plus the
  * trajectory facts an exact gate needs (step count, convergence flag,
  * final cluster sizes, the raw init centers).
  */
class LloydFitResult(
    val init: Array[Array[Double]],
    val nIter: Int,
    val converged: Boolean,
    val clusterSizes: Array[Long],
    val model: KMeansModel)

object KMeans {
  /** Deterministic distributed Lloyd fit, exactly oracle-verifiable end
    * to end (the full `_kmeans_single_lloyd` convergence loop,
    * k_means.py:595-619 — not just one step):
    *
    *  - init: the k rows with the smallest md5 over `keyCols` — a
    *    content-hash-ranked sample (the same family as the spectral
    *    landmark / IVF samples: order- and partitioning-independent),
    *    and SQL-expressible, so the oracle RECOMPUTES the init from the
    *    data instead of trusting embedded literals;
    *  - loop: one mapPartitions job per round computing per-partition
    *    (count, Σx) partials that the driver combines in PARTITION
    *    ORDER (deterministic fp accumulation; same assignment argmin —
    *    first minimum — and the same left-to-right squared-distance
    *    sum as [[KMeansModel.lloydStep]]'s SQL kernel, which remains
    *    the per-step gate). A DataFrame round would re-plan and
    *    re-codegen the assignment expression every round (fresh center
    *    literals → fresh generated source → Janino compile, ~half the
    *    round's wall time); the closure kernel pays neither. The k·p
    *    center doubles collected per round are quantized to 6 dp
    *    before the next round, so the whole trajectory is a
    *    deterministic map on a finite lattice — bit-reproducible as
    *    chained oracle CTEs (the q_kmeans_two_steps handoff generalized
    *    to convergence);
    *  - stop: the rounded centers repeat (a 6 dp Lloyd fixed point —
    *    Lloyd is monotone, so repetition means convergence) or maxIter.
    *
    * Scale: each round is one scan + a k-row collect; driver state is
    * k·p doubles. MLlib's seeded k-means|| (class [[KMeans]]) remains
    * the default throughput path — its init needs fewer rounds — while
    * this fit trades init sophistication for exact verifiability.
    * The returned model's `inertia` is NaN (not computed — call
    * `model.score(df)` for it, one extra pass).
    */
  def fitLloydDeterministic(df: DataFrame, featureCols: Seq[String],
      keyCols: Seq[String], k: Int, maxIter: Int = 40,
      predictionCol: String = "prediction"): LloydFitResult = {
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val keyExpr = md5(concat_ws("|", keyCols.map(c => col(c).cast("string")): _*))
    // Every round re-scores the same rows: project the feature doubles
    // once (names preserved; the cast is an identity on double source
    // columns) and persist for the loop — each round then reads the
    // ~2-column cached frame instead of re-decoding parquet. Released
    // before returning.
    val feat = df
      .select(featureCols.map(c => col(c).cast("double").as(c)) :+ keyExpr.as("__h"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val p = featureCols.size
    val vecs = feat.select(featureCols.map(col): _*).rdd
      .map(r => Array.tabulate(p)(r.getDouble))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val initRows = feat.orderBy("__h").limit(k).collect()
      require(initRows.length == k, s"need at least $k rows, got ${initRows.length}")
      val init = initRows.map(r => Array.tabulate(p)(r.getDouble))
      var centers = init
      var converged = false
      var step = 0
      var sizes = Array.empty[Long]
      while (step < maxIter && !converged) {
        val ctrs = centers
        val partials = vecs.mapPartitions { it =>
          val cnt = new Array[Long](k)
          val sums = Array.ofDim[Double](k, p)
          it.foreach { x =>
            var best = 0; var bd = Double.PositiveInfinity
            var c = 0
            while (c < k) {
              var d = 0.0; var i = 0
              while (i < p) { val t = x(i) - ctrs(c)(i); d += t * t; i += 1 }
              if (d < bd) { bd = d; best = c } // strict < : first minimum
              c += 1
            }
            cnt(best) += 1
            var i = 0
            while (i < p) { sums(best)(i) += x(i); i += 1 }
          }
          Iterator.single((cnt, sums))
        }.collect() // collect (not reduce): combine in partition order
        val cnt = new Array[Long](k)
        val sums = Array.ofDim[Double](k, p)
        partials.foreach { case (c0, s0) =>
          var c = 0
          while (c < k) {
            cnt(c) += c0(c)
            var i = 0
            while (i < p) { sums(c)(i) += s0(c)(i); i += 1 }
            c += 1
          }
        }
        require(cnt.forall(_ > 0), s"cluster went empty at iteration ${step + 1}")
        val next = Array.tabulate(k)(c =>
          Array.tabulate(p)(i => r6(sums(c)(i) / cnt(c))))
        sizes = cnt
        converged = next.zip(centers).forall { case (a, b) => a.sameElements(b) }
        centers = next
        step += 1
      }
      new LloydFitResult(init, step, converged, sizes,
        new KMeansModel(featureCols, centers, Double.NaN, step, predictionCol))
    } finally {
      vecs.unpersist(blocking = false)
      feat.unpersist(blocking = false)
    }
  }
}

object KMeansModel {
  /** Squared euclidean distance to a literal center — codegen'd. */
  def sqDistExpr(featureCols: Seq[String], center: Array[Double]): Column =
    featureCols.zipWithIndex.map { case (c, i) =>
      val d = col(c) - lit(center(i)); d * d
    }.reduce(_ + _)

  /** Argmin over per-center distances (first minimum, like np.argmin). */
  def assignExpr(featureCols: Seq[String], centers: Array[Array[Double]]): Column = {
    val dists = centers.map(sqDistExpr(featureCols, _))
    val arr = array(dists.toIndexedSeq: _*)
    (array_position(arr, array_min(arr)) - 1).cast("int")
  }

  /** One Lloyd iteration from given centers: assign, then per-cluster
    * mean — a single groupBy job (partial aggregation map-side).
    * Exposed for oracle-verified testing of the assignment/update kernel
    * (k_means.py:595-619 `_kmeans_single_lloyd` body).
    */
  def lloydStep(df: DataFrame, featureCols: Seq[String],
      centers: Array[Array[Double]]): DataFrame = {
    df.withColumn("cluster", assignExpr(featureCols, centers))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"),
        featureCols.map(c => avg(col(c)).as(s"c_$c")): _*)
  }
}

class KMeansModel(
    val featureCols: Seq[String],
    val clusterCenters: Array[Array[Double]],
    val inertia: Double,
    val nIter: Int,
    val predictionCol: String
) extends Model {

  def transform(df: DataFrame): DataFrame =
    df.withColumn(predictionCol,
      KMeansModel.assignExpr(featureCols, clusterCenters))

  /** Distance-to-each-center columns (sklearn transform semantics). */
  def transformDistances(df: DataFrame): DataFrame =
    clusterCenters.zipWithIndex.foldLeft(df) { case (d, (ctr, i)) =>
      d.withColumn(s"dist_$i", sqrt(KMeansModel.sqDistExpr(featureCols, ctr)))
    }

  def score(df: DataFrame): Double = {
    val dists = clusterCenters.map(KMeansModel.sqDistExpr(featureCols, _))
    -df.agg(sum(least(dists.toIndexedSeq: _*))).head().getDouble(0)
  }
}
