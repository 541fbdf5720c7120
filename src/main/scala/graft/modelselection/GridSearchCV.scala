package graft.modelselection

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.DataFrame

import graft.core.{Estimator, Model}

/** Ref: dask_ml.model_selection.GridSearchCV / RandomizedSearchCV
  * (model_selection/_search.py:131-1728) with the cv_results_ contract
  * of _search.py:1180-1319 + methods.py:354-446: multimetric scoring,
  * `error_score`, masked per-param arrays, scipy `rankdata` "min" tie
  * ranks, and fit/score timing.
  *
  * The reference's execution model — one explicit task graph with
  * tokenized dedup of identical (estimator, params, fold) fits — maps to
  * a driver-side memo `Map[(fold, params), Future[...]]` plus a
  * bounded ExecutionContext (≈ `n_jobs`): each (candidate, fold) fit is
  * a chain of Spark jobs, and concurrent Futures give inter-candidate
  * parallelism on the cluster scheduler (FAIR-pool friendly).
  * Fold DataFrames are persisted once and shared (the `cache_cv=True`
  * analog, methods.py:83-153) and unpersisted when the search ends.
  */
object ParamGrid {
  /** Cartesian product in stable (sklearn) order. An empty value list
    * is rejected up front (sklearn's "parameter array should not be
    * empty" check, test_grid_search_bad_param_grid) — otherwise the
    * product silently collapses to zero candidates.
    */
  def expand(grid: Map[String, Seq[Any]]): Seq[Map[String, Any]] = {
    grid.foreach { case (k, vs) =>
      require(vs.nonEmpty,
        s"parameter values for '$k' need to be a non-empty sequence")
    }
    val keys = grid.keys.toSeq.sorted
    keys.foldLeft(Seq(Map.empty[String, Any])) { (acc, k) =>
      for (m <- acc; v <- grid(k)) yield m + (k -> v)
    }
  }

  /** sklearn's list-of-grids form: concatenated expansions; candidates
    * from different grids may have DIFFERENT key sets (masked/null in
    * cv_results_).
    */
  def expandMulti(grids: Seq[Map[String, Seq[Any]]]): Seq[Map[String, Any]] =
    grids.flatMap(expand)

  /** Random sample of nIter full combinations (RandomizedSearchCV).
    *
    * Mirrors sklearn's ParameterSampler semantics for all-list grids:
    * sampling is WITHOUT replacement, and when nIter meets or exceeds
    * the number of distinct combinations the full grid is returned
    * (sklearn warns and degrades to an exhaustive search). Without-
    * replacement draws never waste a fit on a duplicate candidate and
    * make small-grid searches deterministic in CONTENT (order still
    * seed-dependent). Large virtual grids are never materialized:
    * distinct combination indices are rejection-sampled and decoded
    * positionally.
    */
  def sample(grid: Map[String, Seq[Any]], nIter: Int, seed: Long): Seq[Map[String, Any]] = {
    val keys = grid.keys.toSeq.sorted
    val sizes = keys.map(k => grid(k).size.toLong)
    val total = sizes.foldLeft(1L)((a, b) =>
      if (a > Long.MaxValue / math.max(b, 1)) Long.MaxValue else a * b)
    if (total <= nIter) expand(grid)
    else if (total <= 10000) {
      val rnd = new scala.util.Random(seed)
      rnd.shuffle(expand(grid)).take(nIter)
    } else {
      val rnd = new scala.util.Random(seed)
      val seen = scala.collection.mutable.LinkedHashSet.empty[Long]
      while (seen.size < nIter) seen += math.floorMod(rnd.nextLong(), total)
      seen.toSeq.map { ix =>
        var rem = ix
        keys.zip(sizes).map { case (k, sz) =>
          val v = grid(k)((rem % sz).toInt); rem /= sz; k -> v
        }.toMap
      }
    }
  }
}

/** Per-metric split scores + aggregates (one block of cv_results_). */
case class MetricResult(
    splitScores: Array[Double],
    mean: Double,
    std: Double,
    rank: Int)

case class CVResult(
    params: Map[String, Any],
    splitScores: Array[Double],
    meanScore: Double,
    stdScore: Double,
    rank: Int,
    metrics: Map[String, MetricResult] = Map.empty,
    meanFitTime: Double = 0.0,
    meanScoreTime: Double = 0.0)

case class SearchResult[M <: Model](
    cvResults: Seq[CVResult],
    bestParams: Map[String, Any],
    bestScore: Double,
    bestModel: M) {
  /** best_estimator_ with the reference's refit=False contract
    * (test_no_refit, _search.py): a search fitted for model selection
    * alone has no refitted estimator, and asking for one fails with
    * the reference's message rather than handing back null.
    */
  def bestEstimator: M = {
    if (bestModel == null) throw new IllegalStateException(
      "This search was initialized with refit=False. best_estimator_ is " +
        "available only after refitting on the best parameters.")
    bestModel
  }

  /** cv_results_ as a DataFrame: masked `param_*` columns (null where a
    * candidate's grid lacks the key), per-metric mean/std/rank and
    * per-split columns, and timing — the _search.py:1180-1319 table.
    */
  def cvResultsDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val paramKeys = cvResults.flatMap(_.params.keys).distinct.sorted
    val metricNames = cvResults.head.metrics.keys.toSeq.sorted
    val nSplits = cvResults.head.splitScores.length
    val fields =
      paramKeys.map(k => StructField(s"param_$k", StringType)) ++
        metricNames.flatMap { m =>
          (0 until nSplits).map(i =>
            StructField(s"split${i}_test_$m", DoubleType)) ++
            Seq(StructField(s"mean_test_$m", DoubleType),
              StructField(s"std_test_$m", DoubleType),
              StructField(s"rank_test_$m", IntegerType))
        } ++
        Seq(StructField("mean_fit_time", DoubleType),
          StructField("mean_score_time", DoubleType))
    val rows = cvResults.map { r =>
      Row.fromSeq(
        // flatMap(Option(_)): a present-but-null param value (sklearn's
        // None entries, test_search_cv_results_none_param) renders as
        // SQL null, same as a masked absent key
        paramKeys.map(k =>
          r.params.get(k).flatMap(Option(_)).map(_.toString).orNull) ++
          metricNames.flatMap { m =>
            val mr = r.metrics(m)
            mr.splitScores.toSeq ++ Seq[Any](mr.mean, mr.std, mr.rank)
          } ++ Seq(r.meanFitTime, r.meanScoreTime))
    }
    spark.createDataFrame(rows.asJava, StructType(fields))
  }
}

class GridSearchCV[M <: Model](
    val makeEstimator: Map[String, Any] => Estimator[M],
    val paramGrid: Map[String, Seq[Any]],
    val scorer: (M, DataFrame) => Double,
    val cv: Int = 3,
    val parallelism: Int = 4,
    val refit: Boolean = true,
    val scorers: Map[String, (M, DataFrame) => Double] = Map.empty[String, (Model, DataFrame) => Double],
    val refitMetric: String = "score",
    val errorScore: Option[Double] = None, // None = raise (sklearn default)
    val paramGrids: Seq[Map[String, Seq[Any]]] = Nil
) {
  protected def candidates: Seq[Map[String, Any]] =
    if (paramGrids.nonEmpty) ParamGrid.expandMulti(paramGrids)
    else ParamGrid.expand(paramGrid)

  /** name → scorer table; the single `scorer` is metric "score". */
  private def allScorers: Map[String, (M, DataFrame) => Double] =
    if (scorers.nonEmpty) scorers else Map("score" -> scorer)

  def fit(df: DataFrame): SearchResult[M] = {
    val cands = candidates
    val sc = allScorers
    require(sc.contains(refitMetric), s"refit metric $refitMetric not in scorers")
    val (folds, cleanup) = Splits.kfoldCached(df, cv)
    val pool = Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // tokenized dedup (normalize_estimator analog): identical param maps
      // fit once per fold even if listed twice in the grid
      val memo = scala.collection.concurrent.TrieMap
        .empty[(Int, Map[String, Any]), Future[(Map[String, Double], Double, Double)]]
      val perCand = cands.map { params =>
        folds.indices.map { f =>
          memo.getOrElseUpdate((f, params), Future {
            val (tr, te) = folds(f)
            try {
              val t0 = System.nanoTime()
              val model = makeEstimator(params).fit(tr)
              val tFit = (System.nanoTime() - t0) / 1e9
              val t1 = System.nanoTime()
              val scores = sc.map { case (name, s) => name -> s(model, te) }
              val tScore = (System.nanoTime() - t1) / 1e9
              (scores, tFit, tScore)
            } catch {
              case e: Exception => errorScore match {
                // _search.py error_score: failed fit scores a constant
                case Some(v) => (sc.keys.map(_ -> v).toMap, 0.0, 0.0)
                case None => throw e
              }
            }
          })
        }
      }
      val resolved = Await.result(
        Future.sequence(perCand.map(Future.sequence(_))), Duration.Inf)

      val metricNames = sc.keys.toSeq
      // per candidate per metric: split scores + mean/std
      val perMetric = cands.indices.map { ci =>
        metricNames.map { m =>
          val ss = resolved(ci).map(_._1(m)).toArray
          val mean = ss.sum / ss.length
          val std = math.sqrt(ss.map(s => (s - mean) * (s - mean)).sum / ss.length)
          m -> (ss, mean, std)
        }.toMap
      }
      // rankdata(method="min") on -mean per metric, NaN ranked last
      def ranks(means: Seq[Double]): Seq[Int] =
        means.map { m =>
          if (m.isNaN) 1 + means.count(x => !x.isNaN)
          else 1 + means.count(x => !x.isNaN && x > m)
        }
      val rankPerMetric: Map[String, Seq[Int]] =
        metricNames.map(m => m -> ranks(perMetric.map(_(m)._2))).toMap

      val results = cands.indices.map { ci =>
        val metrics = metricNames.map { m =>
          val (ss, mean, std) = perMetric(ci)(m)
          m -> MetricResult(ss, mean, std, rankPerMetric(m)(ci))
        }.toMap
        val primary = metrics(refitMetric)
        CVResult(cands(ci), primary.splitScores, primary.mean, primary.std,
          primary.rank, metrics,
          meanFitTime = resolved(ci).map(_._2).sum / folds.size,
          meanScoreTime = resolved(ci).map(_._3).sum / folds.size)
      }
      val best = results.minBy(r => (r.rank, results.indexOf(r)))
      val bestModel =
        if (refit) makeEstimator(best.params).fit(df)
        else null.asInstanceOf[M]
      SearchResult(results, best.params, best.meanScore, bestModel)
    } finally {
      pool.shutdown()
      cleanup()
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

/** One stage of a [[PipelineGridSearchCV]]. */
sealed trait SearchStage { def name: String }

object SearchStage {
  /** Linear estimator stage; params namespaced `name__param`. */
  final case class Est(
      name: String,
      make: Map[String, Any] => Estimator[_ <: Model]) extends SearchStage

  /** FeatureUnion fan-out stage (_search.py:851-955 `_do_featureunion`):
    * `prepare` is the union's stateless hstack projection (e.g.
    * `FeatureUnion.prepare` column copies), then every branch is fitted
    * on the SAME prepared input. Branch params are namespaced
    * `stage__branch__param`, and identical (branch, params) fits are
    * shared ACROSS candidates even when SIBLING branches differ — the
    * reference's per-step tokenized dedup, which linear prefix sharing
    * cannot express.
    */
  final case class Union(
      name: String,
      prepare: DataFrame => DataFrame,
      branches: Seq[(String, Map[String, Any] => Estimator[_ <: Model])]) extends SearchStage
}

/** Pipeline grid search with PREFIX SHARING — the reference's key
  * optimization (_search.py:474-498, 561-587): two candidates whose
  * params agree on stages 0..i share those fitted stages and the
  * transformed intermediate data per fold. [[SearchStage.Union]] stages
  * additionally dedup each branch's fit independently of its siblings
  * (_search.py:851-955).
  *
  * The frame memo key is (fold, stage-chain signature); intermediate
  * transformed DataFrames are persisted once per distinct chain and
  * unpersisted after the search. Union branch models are memoized by
  * (fold, chain-before-stage, branch, branch params).
  */
class PipelineGridSearchCV[M <: Model](
    val stages: Seq[SearchStage],
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
    val (folds, cleanup) = Splits.kfoldCached(df, cv)
    // (fold, stage-chain signature) -> (transformed train, transformed test)
    val frameMemo = scala.collection.mutable.Map.empty[
      (Int, List[Any]), (DataFrame, DataFrame)]
    // (fold, chain before the union, branch, branch params) -> fitted model
    val branchMemo = scala.collection.mutable.Map.empty[
      (Int, List[Any], String, Map[String, Any]), Model]
    fitCount = 0
    try {
      val scored = cands.map { params =>
        val ss = folds.indices.map { f =>
          var (tr, te) = folds(f)
          var chain = List.empty[Any]
          stages.foreach {
            case SearchStage.Est(name, make) =>
              val sp = stageParams(name, params)
              chain = (name, sp) :: chain
              val (ntr, nte) = frameMemo.getOrElseUpdate((f, chain), {
                fitCount += 1
                val m = make(sp).fit(tr)
                (m.transform(tr).persist(), m.transform(te).persist())
              })
              tr = ntr; te = nte
            case SearchStage.Union(name, prepare, branches) =>
              val bps = branches.map { case (bn, _) =>
                bn -> stageParams(s"${name}__$bn", params) }
              val before = chain
              chain = (name, bps) :: chain
              val (ntr, nte) = frameMemo.getOrElseUpdate((f, chain), {
                val trP = prepare(tr); val teP = prepare(te)
                // fan-out: every branch fits the SAME prepared input,
                // deduped per branch across candidates
                val ms = branches.zip(bps).map { case ((bn, mk), (_, bp)) =>
                  branchMemo.getOrElseUpdate((f, name :: before, bn, bp), {
                    fitCount += 1
                    mk(bp).fit(trP): Model
                  })
                }
                (ms.foldLeft(trP)((d, m) => m.transform(d)).persist(),
                  ms.foldLeft(teP)((d, m) => m.transform(d)).persist())
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
        val rank = 1 + scored.count(_._3 > mean)
        CVResult(p, ss, mean, std, rank,
          Map("score" -> MetricResult(ss, mean, std, rank)))
      }
      val best = ranked.minBy(_.rank)
      // refit best pipeline on the full data
      var full = df
      stages.foreach {
        case SearchStage.Est(name, make) =>
          full = make(stageParams(name, best.params)).fit(full).transform(full)
        case SearchStage.Union(name, prepare, branches) =>
          val fp = prepare(full)
          val ms = branches.map { case (bn, mk) =>
            mk(stageParams(s"${name}__$bn", best.params)).fit(fp) }
          full = ms.foldLeft(fp)((d, m) => m.transform(d))
      }
      val bestModel = finalStage._2(stageParams(finalStage._1, best.params)).fit(full)
      SearchResult(ranked, best.params, best.meanScore, bestModel)
    } finally {
      frameMemo.values.foreach { case (a, b) => a.unpersist(false); b.unpersist(false) }
      cleanup()
    }
  }

  /** Number of distinct stage/branch fits actually performed (for tests:
    * must be < candidates × stages × folds when prefixes or union
    * branches overlap).
    */
  def lastFitCount: Int = fitCount
  private var fitCount = 0
}

object PipelineGridSearchCV {
  /** Convenience for the common linear (name -> factory) form. */
  def linear(stages: (String, Map[String, Any] => Estimator[_ <: Model])*): Seq[SearchStage] =
    stages.map { case (n, mk) => SearchStage.Est(n, mk) }
}
