package graft.modelselection

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.linear.{LinearRegression, LinearRegressionModel}
import graft.metrics.Metrics

/** The ported sklearn search-semantics corpus (SURVEY §5.2): each case
  * mirrors a named test from the reference's vendored suite
  * (tests/model_selection/dask_searchcv/test_model_selection_sklearn.py),
  * re-expressed over this library's GridSearchCV/RandomizedSearchCV.
  * Cases that are type-system-impossible in Scala (X-as-list, pandas
  * input, non-iterable grids beyond the empty-seq case) have no port.
  */
class SklearnSearchSemanticsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val data: DataFrame = spark.range(60)
    .select((col("id") % 20).cast("double").as("x"))
    .withColumn("y", col("x") * 2 + 3)
    .cache()

  private def r2 = (m: LinearRegressionModel, t: DataFrame) =>
    Metrics.r2Score(m.transform(t), "y", "prediction")

  private def ols(params: Map[String, Any]): LinearRegression = {
    if (params.get("boom").contains(true))
      throw new RuntimeException("boom") // only thrown at FIT time below
    new LinearRegression(Seq("x"), "y",
      c = params.get("c").map(_.asInstanceOf[Double])
        .getOrElse(Double.PositiveInfinity))
  }

  // Fit-time failing estimator: the FailingClassifier analog — fit
  // throws for one designated parameter value, scoring never runs.
  private class FailingFitEstimator(params: Map[String, Any])
      extends graft.core.Estimator[LinearRegressionModel] {
    def fit(df: DataFrame): LinearRegressionModel = {
      if (params("parameter") == 2)
        throw new IllegalArgumentException("Failing classifier failed as required")
      new LinearRegression(Seq("x"), "y").fit(df)
    }
  }

  // --- test_grid_search (:77): every grid point fit + scored, in the
  // declared iteration order ---
  test("test_grid_search: 3 candidates, stable order, all scored") {
    val search = new GridSearchCV[LinearRegressionModel](
      ols, Map("c" -> Seq(1e6, 1.0, 1e-6)), r2, cv = 3, refit = false)
    val res = search.fit(data)
    assert(res.cvResults.map(_.params("c")) == Seq(1e6, 1.0, 1e-6))
    assert(res.cvResults.forall(_.splitScores.length == 3))
  }

  // --- test_trivial_cv_results_attr (:307): one-point "grid" still
  // yields a full cv_results_ ---
  test("test_trivial_cv_results_attr: one-point grid and n_iter=1 both populate cv_results") {
    val g = new GridSearchCV[LinearRegressionModel](
      ols, Map("c" -> Seq(1.0)), r2, cv = 2, refit = false).fit(data)
    assert(g.cvResults.length == 1)
    assert(g.cvResultsDf(spark).count() == 1)
    val rnd = new RandomizedSearchCV[LinearRegressionModel](
      ols, Map("c" -> Seq(1.0, 2.0, 3.0)), r2, nIter = 1, cv = 2).fit(data)
    assert(rnd.cvResults.length == 1)
  }

  // --- test_no_refit (:320): refit=False leaves no best estimator and
  // asking for one fails with the reference's message ---
  test("test_no_refit: refit=False withholds best_estimator_ with the documented error") {
    val res = new GridSearchCV[LinearRegressionModel](
      ols, Map("c" -> Seq(1e6, 1.0, 1e-6)), r2, cv = 3, refit = false)
      .fit(data)
    assert(res.bestModel == null)
    val e = intercept[IllegalStateException](res.bestEstimator)
    assert(e.getMessage.contains("refit=False"))
    assert(e.getMessage.contains(
      "available only after refitting on the best parameters"))
  }

  // --- test_no_refit_multiple_metrics (:346): same contract under
  // multimetric scoring ---
  test("test_no_refit_multiple_metrics: multimetric refit=False withholds the estimator too") {
    val scorers = Map[String, (LinearRegressionModel, DataFrame) => Double](
      "score_1" -> r2, "score_2" -> r2)
    val res = new GridSearchCV[LinearRegressionModel](
      ols, Map("c" -> Seq(1e6, 1.0)), r2, cv = 3, refit = false,
      scorers = scorers, refitMetric = "score_1").fit(data)
    assert(res.bestModel == null)
    intercept[IllegalStateException](res.bestEstimator)
  }

  // --- test_grid_search_failing_classifier (:1156): error_score=0.0
  // zeroes every split of the failing candidate, others unaffected ---
  test("test_grid_search_failing_classifier: error_score=0.0 zeroes the failing splits") {
    val res = new GridSearchCV[LinearRegressionModel](
      p => new FailingFitEstimator(p), Map("parameter" -> Seq(0, 1, 2)),
      r2, cv = 3, refit = false, errorScore = Some(0.0)).fit(data)
    val byParam = res.cvResults.map(r => r.params("parameter") -> r).toMap
    assert(byParam(2).splitScores.forall(_ == 0.0))
    assert(byParam(0).splitScores.forall(_ != 0.0))
    assert(byParam(1).splitScores.forall(_ != 0.0))
  }

  // --- same test's second half: error_score=NaN propagates NaN into
  // the splits and the NaN candidate ranks LAST ---
  test("test_grid_search_failing_classifier: error_score=NaN propagates and ranks last") {
    val res = new GridSearchCV[LinearRegressionModel](
      p => new FailingFitEstimator(p), Map("parameter" -> Seq(0, 1, 2)),
      r2, cv = 3, refit = false, errorScore = Some(Double.NaN)).fit(data)
    val byParam = res.cvResults.map(r => r.params("parameter") -> r).toMap
    assert(byParam(2).splitScores.forall(_.isNaN))
    assert(byParam(2).meanScore.isNaN)
    assert(byParam(2).rank == 3, "NaN mean must rank after all real means")
    assert(!res.bestParams("parameter").equals(2))
  }

  // --- test_grid_search_failing_classifier_raise (:1212):
  // error_score='raise' (our None) re-throws the fit failure ---
  test("test_grid_search_failing_classifier_raise: default error_score re-raises") {
    val e = intercept[Exception] {
      new GridSearchCV[LinearRegressionModel](
        p => new FailingFitEstimator(p), Map("parameter" -> Seq(0, 1, 2)),
        r2, cv = 3, refit = false, errorScore = None).fit(data)
    }
    assert(e.getMessage.contains("Failing classifier failed as required"))
  }

  // --- test_search_cv_results_rank_tie_breaking (:962): tied means
  // take the 'min' rank — [1, 1, 3] — for grid AND randomized search ---
  test("test_search_cv_results_rank_tie_breaking: min-method ranks [1,1,3]") {
    val grid = Map("c" -> Seq(1e6, 1e6, 1e-9)) // duplicate -> exact tie
    val g = new GridSearchCV[LinearRegressionModel](
      ols, grid, r2, cv = 3, refit = false).fit(data)
    assert(g.cvResults.map(_.rank).sorted == Seq(1, 1, 3))
    val rnd = new RandomizedSearchCV[LinearRegressionModel](
      ols, Map("c" -> Seq(1e6, 1e-9), "d" -> Seq(0.0)), r2,
      nIter = 2, cv = 3).fit(data)
    assert(rnd.cvResults.map(_.rank).min == 1)
  }

  // --- test_search_cv_results_none_param (:1007): a null param value
  // flows into cv_results_ as null, distinct from a masked absent key ---
  test("test_search_cv_results_none_param: null param value lands as null") {
    val res = new GridSearchCV[LinearRegressionModel](
      p => new LinearRegression(Seq("x"), "y"),
      Map("random_state" -> Seq(0, null)), r2, cv = 2, refit = false)
      .fit(data)
    val vals = res.cvResultsDf(spark)
      .select("param_random_state").collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(vals.toSet == Set("0", null))
  }

  // --- test_multiple_metrics (:1251): multimetric cv_results_ carries
  // one full block per metric; refit follows the named metric ---
  test("test_multiple_metrics: per-metric blocks + refit metric selection") {
    val scorers = Map[String, (LinearRegressionModel, DataFrame) => Double](
      "AUC" -> r2,
      "Accuracy" -> ((m, t) => -Metrics.meanSquaredError(
        m.transform(t), "y", "prediction")))
    val res = new GridSearchCV[LinearRegressionModel](
      ols, Map("c" -> Seq(1e6, 1.0)), r2, cv = 3, refit = true,
      scorers = scorers, refitMetric = "AUC").fit(data)
    val cols = res.cvResultsDf(spark).columns.toSet
    for (m <- Seq("AUC", "Accuracy")) {
      assert(cols.contains(s"split0_test_$m"))
      assert(cols.contains(s"split2_test_$m"))
      assert(cols.contains(s"mean_test_$m"))
      assert(cols.contains(s"std_test_$m"))
      assert(cols.contains(s"rank_test_$m"))
    }
    assert(res.cvResults.forall(r => r.meanScore == r.metrics("AUC").mean))
    assert(res.bestModel != null)
  }

  // --- test_refit (:540): refit must construct a FRESH estimator (the
  // BrokenClassifier that cannot be fit twice) ---
  test("test_refit: every fit gets a fresh estimator instance") {
    val instances = new AtomicInteger(0)
    class BrokenOnceEstimator
        extends graft.core.Estimator[LinearRegressionModel] {
      instances.incrementAndGet()
      private var fitted = false
      def fit(df: DataFrame): LinearRegressionModel = {
        assert(!fitted, "broken estimator cannot be fit twice")
        fitted = true
        new LinearRegression(Seq("x"), "y").fit(df)
      }
    }
    val res = new GridSearchCV[LinearRegressionModel](
      _ => new BrokenOnceEstimator, Map("parameter" -> Seq(0, 1)),
      r2, cv = 3, refit = true).fit(data)
    assert(res.bestModel != null)
    // 2 candidates x 3 folds + 1 refit, one instance each
    assert(instances.get() == 7)
  }

  // --- test_grid_search_one_grid_point (:376): the searched best equals
  // a direct fit with those params ---
  test("test_grid_search_one_grid_point: best estimator == direct fit") {
    val res = new GridSearchCV[LinearRegressionModel](
      ols, Map("c" -> Seq(1e6)), r2, cv = 3, refit = true).fit(data)
    val direct = new LinearRegression(Seq("x"), "y", c = 1e6).fit(data)
    assert(res.bestEstimator.coef.zip(direct.coef)
      .forall { case (a, b) => a ~== (b, 1e-9) })
    assert(res.bestEstimator.intercept ~== (direct.intercept, 1e-9))
  }

  // --- test_grid_search_bad_param_grid (:390): an empty value sequence
  // is rejected up front ---
  test("test_grid_search_bad_param_grid: empty value list rejected") {
    val e = intercept[IllegalArgumentException] {
      ParamGrid.expand(Map("C" -> Seq.empty[Any]))
    }
    assert(e.getMessage.contains("non-empty"))
  }
}
