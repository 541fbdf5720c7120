package graft.modelselection

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.DataFrame

import graft.core.{Estimator, Model}

/** Ref: dask_ml.model_selection.GridSearchCV / RandomizedSearchCV
  * (model_selection/_search.py:131-1728).
  *
  * The reference's execution model — one explicit task graph with
  * tokenized dedup of identical (estimator, params, fold) fits — maps to
  * a driver-side memo `Map[(fold, prefixParams), Future[...]]` plus a
  * bounded ExecutionContext (≈ `n_jobs`): each (candidate, fold) fit is
  * a chain of Spark jobs, and concurrent Futures give inter-candidate
  * parallelism on the cluster scheduler (FAIR-pool friendly).
  * Fold DataFrames are persisted once and shared (the `cache_cv=True`
  * analog, methods.py:83-153).
  */
object ParamGrid {
  /** Cartesian product in stable (sklearn) order. */
  def expand(grid: Map[String, Seq[Any]]): Seq[Map[String, Any]] = {
    val keys = grid.keys.toSeq.sorted
    keys.foldLeft(Seq(Map.empty[String, Any])) { (acc, k) =>
      for (m <- acc; v <- grid(k)) yield m + (k -> v)
    }
  }

  /** Random sample of nIter full combinations (RandomizedSearchCV). */
  def sample(grid: Map[String, Seq[Any]], nIter: Int, seed: Long): Seq[Map[String, Any]] = {
    val rnd = new scala.util.Random(seed)
    val keys = grid.keys.toSeq.sorted
    (0 until nIter).map { _ =>
      keys.map(k => k -> grid(k)(rnd.nextInt(grid(k).size))).toMap
    }
  }
}

case class CVResult(
    params: Map[String, Any],
    splitScores: Array[Double],
    meanScore: Double,
    stdScore: Double,
    rank: Int)

case class SearchResult[M <: Model](
    cvResults: Seq[CVResult],
    bestParams: Map[String, Any],
    bestScore: Double,
    bestModel: M) {
  def cvResultsDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    cvResults.map(r => (r.params.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
        .mkString(";"),
        r.meanScore, r.stdScore, r.rank))
      .toDF("params", "mean_test_score", "std_test_score", "rank_test_score")
  }
}

class GridSearchCV[M <: Model](
    val makeEstimator: Map[String, Any] => Estimator[M],
    val paramGrid: Map[String, Seq[Any]],
    val scorer: (M, DataFrame) => Double,
    val cv: Int = 3,
    val parallelism: Int = 4,
    val refit: Boolean = true
) {
  protected def candidates: Seq[Map[String, Any]] = ParamGrid.expand(paramGrid)

  def fit(df: DataFrame): SearchResult[M] = {
    val cands = candidates
    val folds = Splits.kfold(df, cv).map { case (tr, te) => (tr.persist(), te.persist()) }
    val pool = Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // tokenized dedup (normalize_estimator analog): identical param maps
      // fit once per fold even if listed twice in the grid
      val memo = scala.collection.concurrent.TrieMap.empty[(Int, Map[String, Any]), Future[Double]]
      val perCand: Seq[Seq[Future[Double]]] = cands.map { params =>
        folds.indices.map { f =>
          memo.getOrElseUpdate((f, params), Future {
            val (tr, te) = folds(f)
            scorer(makeEstimator(params).fit(tr), te)
          })
        }
      }
      val scores = Await.result(
        Future.sequence(perCand.map(Future.sequence(_))), Duration.Inf)
      val results = cands.zip(scores).map { case (p, ss) =>
        val mean = ss.sum / ss.size
        val std = math.sqrt(ss.map(s => (s - mean) * (s - mean)).sum / ss.size)
        (p, ss.toArray, mean, std)
      }
      // rank: 1 = best (max score), ties share the min rank like rankdata
      val ranked = results.map { case (p, ss, mean, std) =>
        val rank = 1 + results.count(_._3 > mean)
        CVResult(p, ss, mean, std, rank)
      }
      val best = ranked.minBy(_.rank)
      val bestModel = makeEstimator(best.params).fit(df)
      SearchResult(ranked, best.params, best.meanScore, bestModel)
    } finally {
      pool.shutdown()
      folds.foreach { case (tr, te) => tr.unpersist(false); te.unpersist(false) }
    }
  }
}

class RandomizedSearchCV[M <: Model](
    makeEstimator: Map[String, Any] => Estimator[M],
    paramGrid: Map[String, Seq[Any]],
    scorer: (M, DataFrame) => Double,
    val nIter: Int = 10,
    cv: Int = 3,
    parallelism: Int = 4,
    val seed: Long = 42
) extends GridSearchCV[M](makeEstimator, paramGrid, scorer, cv, parallelism) {
  override protected def candidates: Seq[Map[String, Any]] =
    ParamGrid.sample(paramGrid, nIter, seed)
}

/** Pipeline grid search with PREFIX SHARING — the reference's key
  * optimization (_search.py:474-498, 561-587): two candidates whose
  * params agree on stages 0..i share those fitted stages and the
  * transformed intermediate data per fold.
  *
  * Stages are (name, factory); params are namespaced "name__param".
  * The memo key is (fold, prefix params); intermediate transformed
  * DataFrames are persisted once per distinct prefix and unpersisted
  * after the search.
  */
class PipelineGridSearchCV[M <: Model](
    val stages: Seq[(String, Map[String, Any] => Estimator[_ <: Model])],
    val finalStage: (String, Map[String, Any] => Estimator[M]),
    val paramGrid: Map[String, Seq[Any]],
    val scorer: (M, DataFrame) => Double,
    val cv: Int = 3
) {
  private def stageParams(name: String, params: Map[String, Any]): Map[String, Any] =
    params.collect { case (k, v) if k.startsWith(name + "__") =>
      k.drop(name.length + 2) -> v }

  def fit(df: DataFrame): SearchResult[M] = {
    val cands = ParamGrid.expand(paramGrid)
    val folds = Splits.kfold(df, cv).map { case (tr, te) => (tr.persist(), te.persist()) }
    // memo: (fold, prefix param map) -> (fitted stages, transformed train, transformed test)
    val memo = scala.collection.mutable.Map.empty[
      (Int, Seq[Map[String, Any]]), (DataFrame, DataFrame)]
    fitCount = 0
    try {
      val scored = cands.map { params =>
        val ss = folds.indices.map { f =>
          val (tr0, te0) = folds(f)
          var tr = tr0; var te = te0
          val prefix = scala.collection.mutable.ArrayBuffer.empty[Map[String, Any]]
          stages.foreach { case (name, make) =>
            val sp = stageParams(name, params)
            prefix += sp
            val key = (f, prefix.toSeq)
            val (ntr, nte) = memo.getOrElseUpdate(key, {
              fitCount += 1
              val m = make(sp).fit(tr)
              (m.transform(tr).persist(), m.transform(te).persist())
            })
            tr = ntr; te = nte
          }
          val fm = finalStage._2(stageParams(finalStage._1, params)).fit(tr)
          scorer(fm, te)
        }
        val mean = ss.sum / ss.size
        val std = math.sqrt(ss.map(s => (s - mean) * (s - mean)).sum / ss.size)
        (params, ss.toArray, mean, std)
      }
      val ranked = scored.map { case (p, ss, mean, std) =>
        CVResult(p, ss, mean, std, 1 + scored.count(_._3 > mean))
      }
      val best = ranked.minBy(_.rank)
      // refit best pipeline on the full data
      var full = df
      stages.foreach { case (name, make) =>
        full = make(stageParams(name, best.params)).fit(full).transform(full)
      }
      val bestModel = finalStage._2(stageParams(finalStage._1, best.params)).fit(full)
      SearchResult(ranked, best.params, best.meanScore, bestModel)
    } finally {
      memo.values.foreach { case (a, b) => a.unpersist(false); b.unpersist(false) }
      folds.foreach { case (tr, te) => tr.unpersist(false); te.unpersist(false) }
    }
  }

  /** Number of distinct stage fits actually performed (for tests: must be
    * < candidates × stages × folds when prefixes overlap).
    */
  def lastFitCount: Int = fitCount
  private var fitCount = 0
}
