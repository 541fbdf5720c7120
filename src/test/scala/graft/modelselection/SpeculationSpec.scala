package graft.modelselection

import graft.SparkSpec
import graft.wrappers.{LocalModel, LocalSGD}

/** Speculative pre-launch parity (_incremental.py:244-248, 323-327):
  * the likely-next partial_fit of every surviving model is submitted
  * before the policy decides, canceled on cull, and NEVER changes a
  * score — the deterministic shared block order makes trajectories a
  * function of call count alone.
  */
class SpeculationSpec extends SparkSpec {
  import AdaptiveSearch._

  lazy val df = {
    import spark.implicits._
    val rnd = new scala.util.Random(33)
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

  private def search(speculate: Boolean) = new IncrementalSearchCV(
    params => new LocalSGD("squared", params("eta0").asInstanceOf[Double]),
    Map("eta0" -> Seq(1e-4, 0.01, 0.05, 0.1, 0.2)),
    Seq("a", "b"), "y", r2,
    n0 => new InverseDecay(n0, decayRate = 1.0, maxCalls = 20),
    nInitialParameters = 5, testSize = 0.2, seed = 9,
    speculate = speculate)

  test("speculative fits are launched, consumed by survivors, canceled on cull") {
    val res = search(speculate = true).fit(df)
    val s = res.speculation
    assert(s.launched > 0, "multi-round search must pre-launch")
    assert(s.consumed > 0, "survivors must consume their pre-launched call")
    assert(s.canceled > 0,
      s"the decay policy culls models, so launches must be canceled: $s")
    assert(s.consumed + s.canceled <= s.launched)
    // every launch is resolved by loop end — consumed or canceled,
    // nothing leaks
    assert(s.consumed + s.canceled == s.launched)
  }

  test("speculation off reports zero stats") {
    val res = search(speculate = false).fit(df)
    assert(res.speculation == SpeculationStats(0, 0, 0))
  }

  test("scores byte-identical with speculation on and off") {
    val on = search(speculate = true).fit(df)
    val off = search(speculate = false).fit(df)
    assert(on.totalPartialFits == off.totalPartialFits)
    assert(on.bestParams == off.bestParams)
    assert(on.bestScore == off.bestScore, "bit-exact, not approximate")
    val offById = off.history.map(r => r.id -> r).toMap
    on.history.foreach { r =>
      val o = offById(r.id)
      assert(r.calls == o.calls)
      assert(r.scores == o.scores,
        s"model ${r.id}: ${r.scores} vs ${o.scores}")
    }
  }

  test("SHA closed-form schedule unchanged by speculation (consumed calls count)") {
    def run(spec: Boolean) = new SuccessiveHalvingSearchCV(
      params => new ConstantScoreEstimator(params("alpha").asInstanceOf[Double]),
      Map("alpha" -> (1 to 9).map(_ / 10.0: Any)), Seq("a", "b"), "y",
      (m, _, _) => m.asInstanceOf[graft.wrappers.LinearLocalModel].intercept,
      nInitial = 9, r = 1, eta = 3.0, seed = 3, speculate = spec).fit(df)
    val on = run(true)
    val off = run(false)
    assert(on.totalPartialFits == 15 && off.totalPartialFits == 15)
    assert(on.bestScore == off.bestScore)
    assert(on.speculation.launched > 0)
  }

  test("wall-clock win when scoring has real latency (the reference's overlap window)") {
    // The reference's speculation exists to hide the scoring/policy
    // round-trip behind the next fit. Model that window with a scorer
    // that costs 40 ms (a held-out metric computation at real scale):
    // with speculation each round's first fit overlaps the previous
    // round's scoring; without it the loop is strictly serial.
    def slowR2(m: LocalModel, xs: Array[Array[Double]], y: Array[Double]): Double = {
      Thread.sleep(40)
      r2(m, xs, y)
    }
    def run(spec: Boolean): (AdaptiveResult, Double) = {
      val s = new IncrementalSearchCV(
        params => new LocalSGD("squared", params("eta0").asInstanceOf[Double]),
        Map("eta0" -> Seq(0.01, 0.05, 0.1)),
        Seq("a", "b"), "y", slowR2,
        n0 => new InverseDecay(n0, decayRate = 0.0, maxCalls = 12),
        nInitialParameters = 3, testSize = 0.2, seed = 9, speculate = spec)
      val t0 = System.nanoTime()
      val res = s.fit(df)
      (res, (System.nanoTime() - t0) / 1e9)
    }
    run(false) // warm-up
    val (on, tOn) = run(true)
    val (off, tOff) = run(false)
    assert(on.bestScore == off.bestScore)
    assert(on.speculation.consumed > 0)
    info(f"latency-bound wall-clock: on $tOn%.2fs, off $tOff%.2fs, ratio ${tOn / tOff}%.2f")
    // expected ratio ~0.75; the 1.05 margin absorbs shared-box
    // scheduler noise so the suite can't flake on a loaded machine
    // while still catching a speculation path that ADDS latency
    assert(tOn < tOff * 1.05,
      f"speculation must not lose when scoring is the bottleneck: on=$tOn%.2fs off=$tOff%.2fs")
  }

  test("hyperband wall-clock: speculation overlaps scoring (report, loose bound)") {
    def run(spec: Boolean): (AdaptiveResult, Double) = {
      val t0 = System.nanoTime()
      val res = new HyperbandSearchCV(
        params => new LocalSGD("squared", params("eta0").asInstanceOf[Double]),
        Map("eta0" -> Seq(1e-5, 0.01, 0.05, 0.1)),
        Seq("a", "b"), "y", r2, maxIter = 9, seed = 17,
        speculate = spec).fit(df)
      (res, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tOffWarm) = run(false) // warm-up: JIT + block caching
    val (on, tOn) = run(true)
    val (off, tOff) = run(false)
    assert(on.bestScore == off.bestScore)
    assert(on.speculation.consumed > 0)
    info(f"hyperband wall-clock: speculate=on $tOn%.2fs, off $tOff%.2fs " +
      f"(warm-up $tOffWarm%.2fs), ratio ${tOn / tOff}%.2f")
    // the hard guarantee is "never meaningfully slower"; the win itself
    // is load-sensitive on a shared-JVM test box, so it is reported,
    // not asserted
    assert(tOn <= tOff * 1.5 + 2.0,
      f"speculation should not slow the search: on=$tOn%.2fs off=$tOff%.2fs")
  }
}
