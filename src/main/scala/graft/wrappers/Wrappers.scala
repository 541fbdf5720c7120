package graft.wrappers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Model

/** Ref: dask_ml.wrappers.ParallelPostFit (wrappers.py:23-416): take an
  * already-fitted in-memory model, broadcast it, and apply per
  * partition. Here the model is any [[LocalModel]]; predict is one
  * map-only stage over a broadcast handle (`X.map_blocks(_predict, ...)`
  * ≈ broadcast + udf). `predictProba` / `predictLogProba` mirror
  * wrappers.py:337-380 / 382-401: per-class probability columns
  * `proba_0..proba_{c-1}` (log_proba: natural log of each).
  */
class ParallelPostFit(
    val model: LocalModel,
    val featureCols: Seq[String],
    val predictionCol: String = "prediction"
) extends Model {
  private def features = array(featureCols.map(c => col(c).cast("double")): _*)

  def transform(df: DataFrame): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val f = udf { xs: Seq[Double] => bc.value.predict(xs.toArray) }
    df.withColumn(predictionCol, f(features))
  }

  /** wrappers.py:337-380: stack per-class probabilities. The class count
    * is probed once on the driver with a zero vector (the reference
    * reads it off `_meta`).
    */
  def predictProba(df: DataFrame): DataFrame = {
    require(model.hasProba, s"$model does not implement predict_proba")
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val nClasses = model.predictProba(Array.fill(featureCols.size)(0.0)).length
    val f = udf { xs: Seq[Double] => bc.value.predictProba(xs.toArray).toSeq }
    val withArr = df.withColumn("__proba", f(features))
    (0 until nClasses).foldLeft(withArr)((d, c) =>
      d.withColumn(s"proba_$c", element_at(col("__proba"), c + 1)))
      .drop("__proba")
  }

  /** wrappers.py:382-401: log of predict_proba. */
  def predictLogProba(df: DataFrame): DataFrame = {
    val nClasses = model.predictProba(Array.fill(featureCols.size)(0.0)).length
    val withP = predictProba(df)
    (0 until nClasses).foldLeft(withP)((d, c) =>
      d.withColumn(s"log_proba_$c", log(col(s"proba_$c")))
        .drop(s"proba_$c"))
  }
}

/** Ref: dask_ml.wrappers.Incremental + _partial.fit (_partial.py:24-139,
  * wrappers.py:419-603): sequential `partial_fit` over blocks in random
  * order — a linear chain where step i trains on block i with the state
  * from step i−1.
  *
  * Spark mapping (SURVEY.md §2.4): the chain becomes a driver foldLeft
  * over shuffled partition ids of a persisted RDD; each step is a
  * single-partition job (`sc.runJob(rdd, f, Seq(pid))`) that ships the
  * current state in the closure and returns the updated state. Visit
  * order and per-step semantics match the reference exactly; each job
  * reads one cached partition, so an epoch costs one scan like dask's.
  */
class Incremental[S: scala.reflect.ClassTag](
    val estimator: OnlineLearner[S],
    val featureCols: Seq[String],
    val labelCol: String,
    val epochs: Int = 1,
    val shuffleBlocks: Boolean = true,
    val seed: Long = 42
) {
  def fit(df: DataFrame): IncrementalModel[S] = {
    val p = featureCols.size
    val data = df
      .select((featureCols :+ labelCol).map(c => col(c).cast("double")): _*)
      .rdd.map(r => (Array.tabulate(p)(r.getDouble), r.getDouble(p)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sc = df.sparkSession.sparkContext
    val nParts = data.getNumPartitions
    var state = estimator.init(p)
    val rnd = new scala.util.Random(seed)
    for (epoch <- 0 until epochs) {
      val order =
        if (shuffleBlocks) rnd.shuffle((0 until nParts).toVector)
        else (0 until nParts).toVector
      for (pid <- order) {
        val cur = state
        val est = estimator
        val res = sc.runJob(data,
          (it: Iterator[(Array[Double], Double)]) => {
            val rows = it.toArray
            if (rows.isEmpty) cur
            else est.partialFit(cur, rows.map(_._1), rows.map(_._2))
          }, Seq(pid))
        state = res.head
      }
    }
    data.unpersist(blocking = false)
    new IncrementalModel(estimator.model(state), featureCols, state)
  }
}

class IncrementalModel[S](
    val model: LocalModel,
    val featureCols: Seq[String],
    val state: S,
    val predictionCol: String = "prediction"
) extends Model {
  private val inner = new ParallelPostFit(model, featureCols, predictionCol)
  def transform(df: DataFrame): DataFrame = inner.transform(df)
  def predictProba(df: DataFrame): DataFrame = inner.predictProba(df)
  def predictLogProba(df: DataFrame): DataFrame = inner.predictLogProba(df)
}
