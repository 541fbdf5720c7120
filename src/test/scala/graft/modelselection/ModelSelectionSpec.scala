package graft.modelselection

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.linear.LinearRegression
import graft.metrics.Metrics
import graft.preprocessing.StandardScaler

class ModelSelectionSpec extends SparkSpec {

  lazy val orders = Tables.orders(spark, sfDir).cache()

  test("withRowIndex: dense unique 0..n-1") {
    val idx = Splits.withRowIndex(orders.repartition(7))
    val n = orders.count()
    val row = idx.agg(min("row_index"), max("row_index"),
      countDistinct("row_index")).head()
    assert(row.getLong(0) == 0L && row.getLong(1) == n - 1 && row.getLong(2) == n)
  }

  test("trainTestSplit: disjoint, complete, ~right sizes") {
    val (tr, te) = Splits.trainTestSplit(orders, testSize = 0.25, seed = 1)
    val (nTr, nTe, n) = (tr.count(), te.count(), orders.count())
    assert(nTr + nTe == n)
    assert(math.abs(nTe.toDouble / n - 0.25) < 0.05)
  }

  test("kfold: k disjoint complete folds, test sizes differ by <= 1") {
    val folds = Splits.kfold(orders.repartition(5), 4)
    val sizes = folds.map(_._2.count())
    assert(sizes.sum == orders.count())
    assert(sizes.max - sizes.min <= 1)
    folds.foreach { case (tr, te) => assert(tr.count() + te.count() == orders.count()) }
  }

  test("shuffleSplit produces n distinct splits") {
    val splits = Splits.shuffleSplit(orders, nSplits = 3, testSize = 0.2, seed = 7)
    assert(splits.size == 3)
    val counts = splits.map(_._2.count())
    assert(counts.forall(c => c > 0 && c < orders.count()))
  }

  test("GridSearchCV picks the best-regularized model and dedups identical candidates") {
    val df = orders.withColumn("x", col("o_totalprice") / 1000)
      .withColumn("y", col("o_totalprice") / 500 + lit(3.0))
    val search = new GridSearchCV[graft.linear.LinearRegressionModel](
      params => new LinearRegression(Seq("x"), "y",
        c = params("c").asInstanceOf[Double]),
      Map("c" -> Seq(1e6, 1e-6, 1e6)), // duplicate candidate on purpose
      (m, test) => Metrics.r2Score(m.transform(test), "y", "prediction"),
      cv = 3, parallelism = 2)
    val res = search.fit(df)
    // y is exactly linear in x -> huge C (no regularization) must win
    assert(res.bestParams("c") == 1e6)
    assert(res.bestScore ~== (1.0, 1e-6))
    assert(res.cvResults.map(_.rank).min == 1)
  }

  test("PipelineGridSearchCV shares prefix fits across candidates") {
    val df = orders.withColumn("x", col("o_totalprice") / 1000)
      .withColumn("y", col("o_totalprice") / 500)
    val search = new PipelineGridSearchCV[graft.linear.LinearRegressionModel](
      stages = Seq("scale" -> (p => new StandardScaler(Seq("x"),
        withMean = p("with_mean").asInstanceOf[Boolean]))),
      finalStage = "lr" -> (p => new LinearRegression(Seq("x"), "y",
        c = p("c").asInstanceOf[Double])),
      paramGrid = Map(
        "scale__with_mean" -> Seq(true, false),
        "lr__c" -> Seq(1e6, 1.0, 1e-4)),
      scorer = (m, test) => Metrics.r2Score(m.transform(test), "y", "prediction"),
      cv = 2)
    val res = search.fit(df)
    // 6 candidates × 2 folds, but only 2 distinct scaler configs × 2 folds
    assert(search.lastFitCount == 4,
      s"prefix sharing broken: ${search.lastFitCount} stage fits")
    assert(res.bestScore > 0.99)
  }

  test("ParamGrid.expand is the full cartesian product in stable order") {
    val g = ParamGrid.expand(Map("a" -> Seq(1, 2), "b" -> Seq("x", "y")))
    assert(g.size == 4 && g.distinct.size == 4)
  }

  test("stratifiedSample roughly preserves label balance") {
    val s = Splits.stratifiedSample(orders, "o_orderstatus", 0.5, seed = 3)
    val orig = orders.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val samp = s.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    orig.foreach { case (k, n) =>
      assert(math.abs(samp(k).toDouble / n - 0.5) < 0.15) }
  }
}
