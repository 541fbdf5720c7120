package graft.modelselection

import graft.SparkSpec
import graft.wrappers.{LocalModel, LocalSGD}

class AdaptiveSearchSpec extends SparkSpec {
  import AdaptiveSearch._

  // y = 4a - 2b + 1; best eta0 should be findable among the grid
  lazy val df = {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    (1 to 1200).map { _ =>
      val a = rnd.nextDouble() * 2; val b = rnd.nextDouble()
      (a, b, 4 * a - 2 * b + 1)
    }.toDF("a", "b", "y").repartition(8).cache()
  }

  private def r2(m: LocalModel, xs: Array[Array[Double]], y: Array[Double]): Double = {
    val preds = xs.map(m.predict)
    val mean = y.sum / y.length
    val ssRes = preds.zip(y).map { case (p, t) => (p - t) * (p - t) }.sum
    val ssTot = y.map(t => (t - mean) * (t - mean)).sum
    1.0 - ssRes / ssTot
  }

  test("hyperband bracket schedule mirrors the paper formulas") {
    // R=27, eta=3 -> brackets s=3..0 (Li et al. 2018 Table 1 shape)
    val params = hyperbandParams(27, 3.0)
    assert(params.map(_._1) == Seq(3, 2, 1, 0))
    assert(params.map(_._2) == Seq(27, 12, 6, 4)) // n per bracket
    assert(params.map(_._3) == Seq(1, 3, 9, 27)) // r per bracket
    // metadata: total partial_fit calls per bracket under no early stop
    val meta = hyperbandMetadata(27, 3.0)
    assert(meta.map(_._2) == Seq(27, 12, 6, 4))
    meta.foreach { case (_, n, calls) => assert(calls > 0 && calls <= 27 * n) }
  }

  test("SuccessiveHalving policy halves the field each rung") {
    val pol = new SuccessiveHalving(n = 9, r = 1, eta = 3.0)
    def rec(id: Int, score: Double, calls: Int) =
      ModelRecord(id, Map.empty, null, Vector(score), calls)
    // after 1 call each, policy moves to rung 1: keep floor(9/3)=3 best
    val recs = (0 until 9).map(i => i -> rec(i, i.toDouble, 1)).toMap
    val next = pol.additionalCalls(recs)
    assert(next.keySet == Set(6, 7, 8))
    assert(next.values.toSet == Set(2)) // train to r*eta = 3 calls
  }

  test("IncrementalSearchCV with inverse decay finds a good learning rate") {
    val search = new IncrementalSearchCV(
      params => new LocalSGD("squared", params("eta0").asInstanceOf[Double]),
      Map("eta0" -> Seq(1e-4, 0.01, 0.05, 0.1, 0.2)),
      Seq("a", "b"), "y", r2,
      n0 => new InverseDecay(n0, decayRate = 1.0, maxCalls = 20),
      nInitialParameters = 5, testSize = 0.2, seed = 9)
    val res = search.fit(df)
    assert(res.bestScore > 0.8, s"best=${res.bestScore} params=${res.bestParams}")
    assert(res.totalPartialFits > 5) // more than just the initial round
    // losers trained fewer times than the winner
    val calls = res.history.map(_.calls)
    assert(calls.max > calls.min)
  }

  test("hyperband metadata pins the reference's paper counts") {
    // tests/model_selection/test_hyperband.py:98-101: total models and
    // partial_fit calls per max_iter
    def totals(maxIter: Int) = {
      val m = hyperbandMetadata(maxIter, 3.0)
      (m.map(_._2).sum, m.map(_._3).sum)
    }
    assert(totals(9) == ((17, 69)))
    assert(totals(27) == ((49, 357)))
    assert(totals(81) == ((143, 1581)))
  }

  test("SHA over constant-score estimators follows the closed-form schedule") {
    val alphas: Seq[Any] = (1 to 9).map(_ / 10.0)
    val search = new SuccessiveHalvingSearchCV(
      params => new ConstantScoreEstimator(params("alpha").asInstanceOf[Double]),
      Map("alpha" -> alphas), Seq("a", "b"), "y",
      (m, _, _) => m.asInstanceOf[graft.wrappers.LinearLocalModel].intercept,
      nInitial = 9, r = 1, eta = 3.0, seed = 3)
    val res = search.fit(df)
    assert(res.bestScore ~== 0.9)
    val byAlpha = res.history.map(r =>
      r.params("alpha").asInstanceOf[Double] -> r.calls).toMap
    assert((1 to 6).forall(i => byAlpha(i / 10.0) == 1))
    assert((7 to 9).forall(i => byAlpha(i / 10.0) == 3))
    assert(res.totalPartialFits == 15)
  }

  test("ParamGrid.sample is without replacement and degrades to the full grid") {
    val grid = Map("a" -> Seq(1, 2, 3), "b" -> Seq("x", "y"))
    val all = ParamGrid.sample(grid, 100, seed = 1)
    assert(all.size == 6 && all.distinct.size == 6)
    val four = ParamGrid.sample(grid, 4, seed = 2)
    assert(four.size == 4 && four.distinct.size == 4)
  }

  test("concurrent hyperband brackets fan out to bracket threads; results match sequential") {
    // Deterministic structural check instead of the old load-sensitive
    // wall-clock compare: each bracket's IncrementalSearchCV builds its
    // estimators ON the bracket's thread, so the set of threads that
    // invoke makeEstimator distinguishes the two modes exactly —
    // sequential runs every bracket on the caller thread, concurrent
    // submits all brackets to a bracket-count pool up front (one fresh
    // thread each). Result equality pins that concurrency changes
    // nothing semantically.
    def run(concurrent: Boolean, seed: Long): (AdaptiveResult, Int) = {
      val threads = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      val hb = new HyperbandSearchCV(
        params => {
          threads.add(Thread.currentThread().getName)
          new ConstantScoreEstimator(params("v").asInstanceOf[Double])
        },
        Map("v" -> (1 to 30).map(_ / 30.0: Any)),
        Seq("a", "b"), "y",
        (m, _, _) => m.asInstanceOf[graft.wrappers.LinearLocalModel].intercept,
        maxIter = 9, seed = seed, concurrentBrackets = concurrent)
      (hb.fit(df), threads.size)
    }
    val (rSeq, tSeq) = run(concurrent = false, 5)
    val (rCon, tCon) = run(concurrent = true, 5)
    assert(rCon.bestScore ~== rSeq.bestScore)
    assert(rCon.totalPartialFits == rSeq.totalPartialFits)
    assert(tSeq == 1, s"sequential brackets must share the caller thread, saw $tSeq")
    assert(tCon >= 2, s"concurrent brackets must fan out to bracket threads, saw $tCon")
  }

  test("Hyperband runs all brackets and returns the overall best") {
    val hb = new HyperbandSearchCV(
      params => new LocalSGD("squared", params("eta0").asInstanceOf[Double]),
      Map("eta0" -> Seq(1e-5, 0.01, 0.05, 0.1)),
      Seq("a", "b"), "y", r2, maxIter = 9, seed = 17)
    assert(hb.metadata.length == 3) // s = 2,1,0 for R=9, eta=3
    val res = hb.fit(df)
    assert(res.bestScore > 0.8, s"best=${res.bestScore}")
    assert(res.history.nonEmpty)
  }
}
