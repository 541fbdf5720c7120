package graft.cluster

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.decomposition.{PCA, TruncatedSVD}
import graft.ensemble.{BlockwiseVotingClassifier, BlockwiseVotingRegressor}
import graft.linear.{LinearRegression, LogisticRegression, PoissonRegression}
import graft.metrics.Metrics
import graft.wrappers.{Incremental, LocalOLS, LocalSGD, ParallelPostFit}

class EstimatorsSpec extends SparkSpec {

  lazy val li = Tables.lineitem(spark, sfDir).cache()

  // deterministic synthetic regression: y = 2a - 3b + 5 (+0 noise)
  lazy val reg = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 400).map { _ =>
      val a = rnd.nextDouble() * 10; val b = rnd.nextDouble() * 4
      (a, b, 2 * a - 3 * b + 5)
    }.toDF("a", "b", "y").repartition(4).cache()
  }

  test("KMeans fit converges and predicts all points to fitted clusters") {
    val m = new KMeans(Seq("l_quantity", "l_extendedprice"), nClusters = 3,
      seed = 1).fit(li)
    assert(m.clusterCenters.length == 3)
    assert(m.inertia > 0)
    val preds = m.transform(li).select("prediction").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(preds.toSeq == Seq(0, 1, 2))
    // score = -inertia-ish (same order of magnitude)
    assert(m.score(li) < 0)
  }

  test("deterministic Lloyd fit: converges, partition-independent, monotone inertia") {
    val f = KMeans.fitLloydDeterministic(li, Seq("l_quantity", "l_extendedprice"),
      Seq("l_orderkey", "l_linenumber"), k = 3, maxIter = 40)
    assert(f.converged, s"did not converge in 40 rounds (nIter=${f.nIter})")
    assert(f.clusterSizes.sum == li.count() && f.clusterSizes.forall(_ > 0))
    // md5-ranked init + quantized handoffs: the whole trajectory is a
    // pure function of the data — identical under any partitioning
    val g = KMeans.fitLloydDeterministic(li.repartition(13),
      Seq("l_quantity", "l_extendedprice"),
      Seq("l_orderkey", "l_linenumber"), k = 3, maxIter = 40)
    assert(f.nIter == g.nIter)
    assert(f.model.clusterCenters.map(_.toSeq).toSeq ==
      g.model.clusterCenters.map(_.toSeq).toSeq)
    // converged centers are a Lloyd fixed point: one more step from them
    // cannot improve inertia beyond the 6 dp quantization regime
    val inertia = -f.model.score(li)
    val stepped = KMeansModel.lloydStep(li, Seq("l_quantity", "l_extendedprice"),
      f.model.clusterCenters).orderBy("cluster").collect()
      .map(r => Array(r.getDouble(r.fieldIndex("c_l_quantity")),
        r.getDouble(r.fieldIndex("c_l_extendedprice"))))
    val steppedInertia = -new KMeansModel(Seq("l_quantity", "l_extendedprice"),
      stepped, 0.0, 0, "p").score(li)
    assert(steppedInertia <= inertia * (1 + 1e-9) &&
      steppedInertia >= inertia * (1 - 1e-6))
  }

  test("LinearRegression normal solver recovers exact coefficients") {
    val m = new LinearRegression(Seq("a", "b"), "y").fit(reg)
    assert(m.coef(0) ~== (2.0, 1e-8))
    assert(m.coef(1) ~== (-3.0, 1e-8))
    assert(m.intercept ~== (5.0, 1e-8))
    assert(m.score(reg) ~== (1.0, 1e-12))
  }

  test("LinearRegression normal == lbfgs on well-conditioned data") {
    val normal = new LinearRegression(Seq("a", "b"), "y").fit(reg)
    val lbfgs = new LinearRegression(Seq("a", "b"), "y", solver = "lbfgs").fit(reg)
    assert(normal.coef(0) ~== (lbfgs.coef(0), 1e-4))
    assert(normal.intercept ~== (lbfgs.intercept, 1e-3))
  }

  test("every reference solver name fits (or rejects) per the glm.py contract") {
    // newton/admm: exact for the quadratic objective
    for (s <- Seq("newton", "admm")) {
      val m = new LinearRegression(Seq("a", "b"), "y", solver = s).fit(reg)
      assert(m.coef(0) ~== (2.0, 1e-8), s"solver=$s")
      assert(m.intercept ~== (5.0, 1e-8), s"solver=$s")
    }
    // gradient_descent/proximal_grad: BB gradient loop on the cached Gram
    for (s <- Seq("gradient_descent", "proximal_grad")) {
      val m = new LinearRegression(Seq("a", "b"), "y", solver = s,
        maxIter = 300).fit(reg)
      assert(m.coef(0) ~== (2.0, 1e-5), s"solver=$s")
      assert(m.coef(1) ~== (-3.0, 1e-5), s"solver=$s")
      assert(m.intercept ~== (5.0, 1e-4), s"solver=$s")
    }
    // unknown names raise, exactly like glm.py:166-168
    intercept[IllegalArgumentException] {
      new LinearRegression(Seq("a"), "y", solver = "sgd").fit(reg)
    }
    intercept[IllegalArgumentException] {
      new LogisticRegression(Seq("a"), "y", solver = "bogus").fit(reg)
    }
    intercept[IllegalArgumentException] {
      new PoissonRegression(Seq("a"), "y", solver = "bogus").fit(reg)
    }
  }

  test("logistic accepts every dask-glm solver name (same smooth optimum)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val cls = (1 to 300).map { _ =>
      val a = rnd.nextDouble() * 4 - 2
      (a, if (a > 0.3) 1.0 else 0.0)
    }.toDF("a", "label").cache()
    val base = new LogisticRegression(Seq("a"), "label").fit(cls)
    for (s <- Seq("newton", "admm", "gradient_descent", "proximal_grad")) {
      val m = new LogisticRegression(Seq("a"), "label", solver = s).fit(cls)
      assert(m.coef(0) ~== (base.coef(0), 1e-6), s"solver=$s")
    }
  }

  test("ridge shrinks coefficients monotonically") {
    val free = new LinearRegression(Seq("a", "b"), "y", c = 1e9).fit(reg)
    val tight = new LinearRegression(Seq("a", "b"), "y", c = 1e-3).fit(reg)
    assert(math.abs(tight.coef(0)) < math.abs(free.coef(0)))
  }

  test("LogisticRegression separates a linear boundary; proba in [0,1]") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val d = (1 to 500).map { _ =>
      val a = rnd.nextDouble() * 2 - 1; val b = rnd.nextDouble() * 2 - 1
      (a, b, if (a + b > 0) 1.0 else 0.0)
    }.toDF("a", "b", "label").cache()
    val m = new LogisticRegression(Seq("a", "b"), "label", c = 1e4).fit(d)
    assert(m.score(d) > 0.95)
    val probs = m.predictProba(d).agg(min("proba_1"), max("proba_1")).head()
    assert(probs.getDouble(0) >= 0 && probs.getDouble(1) <= 1)
  }

  test("PoissonRegression predicts positive rates") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val d = (1 to 300).map { _ =>
      val x = rnd.nextDouble()
      (x, math.max(0.0, math.round(math.exp(1.0 + 0.5 * x) + rnd.nextGaussian() * 0.3).toDouble))
    }.toDF("x", "y").cache()
    val m = new PoissonRegression(Seq("x"), "y").fit(d)
    val preds = m.transform(d).agg(min("prediction")).head().getDouble(0)
    assert(preds > 0)
  }

  test("PCA: components orthonormal, EVR sums to 1 over full rank, roundtrip") {
    val m = new PCA(Seq("a", "b"), nComponents = 2).fit(reg)
    val dot = m.components(0).zip(m.components(1)).map { case (x, y) => x * y }.sum
    assert(dot ~== (0.0, 1e-9))
    assert(m.explainedVarianceRatio.sum ~== (1.0, 1e-9))
    val t = m.transform(reg.withColumn("a0", col("a")).withColumn("b0", col("b")))
    val rt = m.inverseTransform(t)
    val err = rt.agg(max(abs(col("a") - col("a0"))) + max(abs(col("b") - col("b0"))))
      .head().getDouble(0)
    assert(err < 1e-9)
  }

  test("PCA whiten: unit-variance pcs, full-rank roundtrip exact (pca.py:379-441)") {
    val m = new PCA(Seq("a", "b"), nComponents = 2, whiten = true).fit(reg)
    val t = m.transform(reg.withColumn("a0", col("a")).withColumn("b0", col("b")))
      .cache()
    // whitened projections have population variance exactly ev/ev = 1
    val vars = t.agg(var_pop(col("pc_0")), var_pop(col("pc_1"))).head()
    assert(vars.getDouble(0) ~== (1.0, 1e-9))
    assert(vars.getDouble(1) ~== (1.0, 1e-9))
    // inverse undoes the whitening scale: full-rank roundtrip is exact
    val rt = m.inverseTransform(t)
    val err = rt.agg(max(abs(col("a") - col("a0"))) + max(abs(col("b") - col("b0"))))
      .head().getDouble(0)
    assert(err < 1e-9)
    // whiten changes only the per-component scale: pc_whiten * sqrt(ev) == pc_plain
    val plain = new PCA(Seq("a", "b"), nComponents = 2).fit(reg).transform(reg)
    val s0 = math.sqrt(m.explainedVariance(0))
    val diff = t.select((col("pc_0") * s0).as("w0"), col("a"), col("b"))
      .join(plain.select(col("pc_0").as("p0"), col("a"), col("b")), Seq("a", "b"))
      .agg(max(abs(col("w0") - col("p0")))).head().getDouble(0)
    assert(diff < 1e-9)
    t.unpersist()
  }

  test("TruncatedSVD on uncentered data differs from PCA") {
    val svd = new TruncatedSVD(Seq("a", "b"), 1).fit(reg)
    val pca = new PCA(Seq("a", "b"), 1).fit(reg)
    assert(math.abs(svd.explainedVariance(0) - pca.explainedVariance(0)) > 1e-6)
  }

  test("BlockwiseVotingRegressor averages per-partition OLS fits") {
    val m = new BlockwiseVotingRegressor(Seq("a", "b"), "y", new LocalOLS()).fit(reg)
    assert(m.estimators.length == 4)
    val r2 = Metrics.r2Score(m.transform(reg), "y", "prediction")
    assert(r2 > 0.999) // every block sees the exact linear law
  }

  test("BlockwiseVotingClassifier majority vote") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val d = (1 to 400).map { _ =>
      val a = rnd.nextDouble() * 2 - 1
      (a, 0.0, if (a > 0) 1.0 else 0.0)
    }.toDF("a", "b", "label").repartition(4).cache()
    val m = new BlockwiseVotingClassifier(Seq("a", "b"), "label",
      new LocalOLS()).fit(d)
    // OLS regression output thresholded per model vote... predictions are
    // continuous; majority of 4 similar fits -> just check it runs and is
    // well-formed
    val out = m.transform(d)
    assert(out.count() == 400)
  }

  test("Incremental SGD converges on the linear law over epochs") {
    val inc = new Incremental(new LocalSGD("squared", eta0 = 0.05),
      Seq("a", "b"), "y", epochs = 8, seed = 3)
    val m = inc.fit(reg)
    val r2 = Metrics.r2Score(m.transform(reg), "y", "prediction")
    assert(r2 > 0.9, s"r2=$r2")
    assert(m.state.seen == 400L * 8)
  }

  test("ParallelPostFit broadcasts a prefit local model") {
    val local = new LocalOLS().fit(
      Array(Array(1.0, 0.0), Array(2.0, 0.0), Array(3.0, 0.0)),
      Array(2.0, 4.0, 6.0))
    val ppf = new ParallelPostFit(local, Seq("a", "b"))
    val out = ppf.transform(reg)
    // local model learned y = 2a
    val err = out.agg(max(abs(col("prediction") - col("a") * 2))).head().getDouble(0)
    assert(err < 1e-6)
  }

  test("IncrementalPCA matches batch PCA up to sign") {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val batch = new PCA(cols, nComponents = 2).fit(li)
    val inc = new graft.decomposition.IncrementalPCA(cols, nComponents = 2).fit(li)
    for (j <- 0 until 2) {
      assert(math.abs(inc.explainedVariance(j) - batch.explainedVariance(j))
        / batch.explainedVariance(j) < 1e-8)
      // components equal up to sign; svd_flip makes signs agree too
      for (i <- cols.indices)
        assert(math.abs(math.abs(inc.components(j)(i)) - math.abs(batch.components(j)(i))) < 1e-6)
    }
    assert(inc.nSamplesSeen == li.count())
  }

  test("Moments merge is associative and order-insensitive") {
    val rnd = new scala.util.Random(3)
    val xs = Array.fill(90)(Array.fill(2)(rnd.nextDouble() * 5))
    def bulk(rows: Seq[Array[Double]]) =
      rows.foldLeft(graft.decomposition.Moments.zero(2))(graft.decomposition.Moments.add)
    val whole = bulk(xs.toSeq)
    val (a, bc) = xs.splitAt(30); val (b, c) = bc.splitAt(40)
    val m1 = graft.decomposition.Moments.merge(
      graft.decomposition.Moments.merge(bulk(a.toSeq), bulk(b.toSeq)), bulk(c.toSeq))
    val m2 = graft.decomposition.Moments.merge(bulk(a.toSeq),
      graft.decomposition.Moments.merge(bulk(b.toSeq), bulk(c.toSeq)))
    for (m <- Seq(m1, m2); i <- 0 until 2) {
      assert(m.n == whole.n)
      assert(math.abs(m.mean(i) - whole.mean(i)) < 1e-9)
      for (j <- 0 until 2)
        assert(math.abs(m.m2(i)(j) - whole.m2(i)(j)) / math.max(whole.m2(i)(j).abs, 1) < 1e-9)
    }
  }

  test("PCA randomized solver matches full solver (l >= p => exact range)") {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val full = new PCA(cols, nComponents = 2).fit(li)
    val rand = new PCA(cols, nComponents = 2, solver = "randomized").fit(li)
    for (j <- 0 until 2) {
      assert(math.abs(rand.explainedVariance(j) - full.explainedVariance(j))
        / full.explainedVariance(j) < 1e-6,
        s"ev $j: ${rand.explainedVariance(j)} vs ${full.explainedVariance(j)}")
      val dot = cols.indices.map(i =>
        rand.components(j)(i) * full.components(j)(i)).sum
      assert(math.abs(dot) > 0.999999, s"component $j misaligned: $dot")
    }
  }

  test("ModelIO round-trips a fitted model through the filesystem") {
    val m = new LinearRegression(Seq("a", "b"), "y").fit(reg)
    val path = java.nio.file.Files.createTempDirectory("graftio").toString + "/ols.bin"
    graft.core.ModelIO.save(spark, m, path)
    val loaded = graft.core.ModelIO.load[graft.linear.LinearRegressionModel](spark, path)
    assert(loaded.coef.toSeq == m.coef.toSeq && loaded.intercept == m.intercept)
    val viaLoaded = loaded.transform(reg).agg(sum("prediction")).head().getDouble(0)
    val viaOrig = m.transform(reg).agg(sum("prediction")).head().getDouble(0)
    // relative tolerance, not ==: across a real executor boundary the
    // two sums may combine partials in different orders (last-ulp)
    assert(math.abs(viaLoaded - viaOrig) <= 1e-12 * math.abs(viaOrig),
      s"$viaLoaded vs $viaOrig")
  }
}
