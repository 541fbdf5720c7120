package graft.modelselection

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.wrappers.{LocalModel, OnlineEstimator, OnlineState}

/** Ref: dask_ml.model_selection._incremental / _successive_halving /
  * _hyperband.
  *
  * The reference's adaptive-search engine is: create k models; loop
  * { partial_fit each surviving model on the next (shuffled) block;
  * score on a held-out set; a policy (`additional_calls`) decides who
  * trains further } (_incremental.py:138-377).
  *
  * Spark mapping (SURVEY.md §3.3): training blocks are the partitions of
  * a persisted RDD; one partial_fit = one single-partition job
  * (`sc.runJob(rdd, f, Seq(pid))`) shipping the model state in the
  * closure; per round all surviving models train CONCURRENTLY as
  * independent jobs on a bounded driver pool (the Futures ≈
  * `client.submit`, the pool ≈ cluster slots). The test set is collected
  * once to the driver (the reference scatters it to every worker,
  * _incremental.py:194-201 — same "small by design" contract), so
  * scoring is local and free of per-round job overhead.
  *
  * The reference's SPECULATIVE pre-launch (_incremental.py:244-248,
  * 323-327) has full parity here: right after a model's round of
  * partial_fits — BEFORE its driver-local scoring and the policy
  * decision — its likely-next partial_fit is launched on a separate
  * driver pool, tagged with a per-launch Spark job group and the
  * "graft-speculation" scheduler pool (under FAIR scheduling that pool
  * yields to on-policy work — the `priority=-1` analog; under FIFO the
  * tag is inert). A surviving model consumes the speculative state as
  * its round's first call; a culled model's launch is canceled through
  * `cancelJobGroup` (the reference cancels by dropping the future,
  * _incremental.py:299-303). Scores are BYTE-IDENTICAL with
  * speculation on or off because the training-block sequence is the
  * reference's deterministic shared `order` (_incremental.py:210-229):
  * block = order(model's call index), extended by seeded shuffles — a
  * model's trajectory depends only on its call count, never on thread
  * timing or on whether a call ran speculatively.
  */
object AdaptiveSearch {

  /** One model's bookkeeping: history mirrors the reference's `info`
    * records (_incremental.py:296).
    */
  case class ModelRecord(
      id: Int,
      params: Map[String, Any],
      state: OnlineState,
      scores: Vector[Double],
      calls: Int) {
    def bestScore: Double = if (scores.isEmpty) Double.NegativeInfinity else scores.max
    def lastScore: Double = if (scores.isEmpty) Double.NegativeInfinity else scores.last
  }

  /** additional_calls policy: given current records, how many MORE
    * partial_fit calls each surviving model gets (absent id = culled;
    * all zero = stop). (_incremental.py:296-305.)
    */
  trait Policy extends Serializable {
    def additionalCalls(records: Map[Int, ModelRecord]): Map[Int, Int]
  }

  /** IncrementalSearchCV's default `inverse` decay
    * (_incremental.py:1395-1431): at step t keep the top
    * ⌈n₀/(1 + decayRate·t)⌉ models, one more call each (decayRate = 0
    * keeps every model — the reference's base IncrementalSearchCV).
    *
    * Patience follows the reference's `_stop_on_plateau`
    * (_incremental.py:1146-1168) exactly: once a model has made at
    * least `patience` calls, take the scores whose call index is
    * within `patience` of the current call; the model stops when no
    * score in that window improved on the window's FIRST score by
    * more than `tol` (`max(diffs) <= tol`). `patience = 0` means off
    * (the reference's `patience=False`); `patience <= 1` otherwise is
    * rejected up front with the reference's guidance
    * (_incremental.py:1109-1113), as is `maxCalls < 1`
    * (_incremental.py:569-574).
    */
  class InverseDecay(n0: Int, decayRate: Double = 1.0,
      patience: Int = 0, tol: Double = 1e-4,
      maxCalls: Int = 100) extends Policy {
    require(maxCalls >= 1,
      s"Received max_iter=$maxCalls. max_iter < 1 is not supported")
    require(patience == 0 || patience >= 2,
      s"patience=$patience<=1 will always detect a plateau. " +
        "To resolve this, set patience >= 2 (or 0 to disable)")
    private var step = 0
    def additionalCalls(records: Map[Int, ModelRecord]): Map[Int, Int] = {
      step += 1
      val keep = math.max(1, math.ceil(n0 / (1.0 + decayRate * step)).toInt)
      val alive = records.values.toSeq.sortBy(-_.lastScore).take(keep)
      val out = alive.map { r =>
        // scores(i) is the score after call i+1 (one score per call
        // here — fits_per_score = 1); the reference windows on CALL
        // distance: keep h with current_calls - h.calls <= patience
        val plateaued = patience > 0 && r.calls >= patience && {
          val window = r.scores.zipWithIndex.collect {
            case (s, i) if r.calls - (i + 1) <= patience => s
          }
          window.size >= 2 && window.tail.map(_ - window.head).max <= tol
        }
        r.id -> (if (plateaued || r.calls >= maxCalls) 0 else 1)
      }.toMap
      // terminate when only one survivor and it has plateaued/maxed
      if (out.values.forall(_ == 0)) out
      else if (records.size == 1 && out.values.sum == 0) Map(records.head._1 -> 0)
      else out
    }
  }

  /** SuccessiveHalvingSearchCV (_successive_halving.py:230-256): rung i
    * keeps n·η⁻ⁱ models trained to r·ηⁱ calls.
    */
  class SuccessiveHalving(n: Int, r: Int, eta: Double = 3.0,
      limit: Option[Int] = None) extends Policy {
    private var rung = 0
    def additionalCalls(records: Map[Int, ModelRecord]): Map[Int, Int] = {
      val target = (r * math.pow(eta, rung)).toInt
      val pending = records.filter(_._2.calls < target)
      if (pending.nonEmpty)
        pending.map { case (id, rec) => id -> (target - rec.calls) }
      else {
        rung += 1
        val keep = math.max(1, math.floor(n * math.pow(eta, -rung)).toInt)
        val done = limit.exists(rung > _) || keep <= 1 ||
          (r * math.pow(eta, rung)).toInt > 1000
        if (done) Map(records.values.maxBy(_.lastScore).id -> 0)
        else {
          val survivors = records.values.toSeq.sortBy(-_.lastScore).take(keep)
          val nextTarget = (r * math.pow(eta, rung)).toInt
          survivors.map(rec => rec.id -> math.max(0, nextTarget - rec.calls)).toMap
        }
      }
    }
  }

  /** Hyperband bracket schedule (_hyperband.py:20-55, Li et al. 2018):
    * returns (bracket s, n models, r initial calls).
    */
  def hyperbandParams(maxIter: Int, eta: Double = 3.0): Seq[(Int, Int, Int)] = {
    val sMax = (math.log(maxIter) / math.log(eta)).toInt
    val budget = (sMax + 1.0) * maxIter
    (sMax to 0 by -1).map { s =>
      val n = math.ceil(budget / maxIter * math.pow(eta, s) / (s + 1)).toInt
      val r = (maxIter * math.pow(eta, -s)).toInt
      (s, n, r)
    }
  }

  /** Planned partial_fit counts per bracket (`metadata`,
    * _hyperband.py:563-664): models and total calls if no early stop.
    */
  def hyperbandMetadata(maxIter: Int, eta: Double = 3.0): Seq[(Int, Int, Int)] =
    hyperbandParams(maxIter, eta).map { case (s, n, r) =>
      // simulate SHA rungs: rung i has floor(n·η^-i) models at r·η^i calls
      var calls = 0; var models = n; var rung = 0
      var total = 0
      var prev = 0
      while (models >= 1 && (r * math.pow(eta, rung)).toInt <= maxIter) {
        val target = (r * math.pow(eta, rung)).toInt
        total += models * (target - prev)
        prev = target
        rung += 1
        models = math.floor(n * math.pow(eta, -rung)).toInt
      }
      (s, n, total)
    }
}

object IncrementalSearchCV {
  /** JVM-global speculative-launch counter: job-group names must never
    * repeat across fits sharing a SparkContext (see launchSpeculative).
    */
  private[modelselection] val specGroupSeq =
    new java.util.concurrent.atomic.AtomicLong()
}

/** The adaptive-search driver loop shared by IncrementalSearchCV,
  * SuccessiveHalvingSearchCV and HyperbandSearchCV.
  */
class IncrementalSearchCV(
    val makeEstimator: Map[String, Any] => OnlineEstimator,
    val paramGrid: Map[String, Seq[Any]],
    val featureCols: Seq[String],
    val labelCol: String,
    val scorer: (LocalModel, Array[Array[Double]], Array[Double]) => Double,
    val makePolicy: Int => AdaptiveSearch.Policy,
    val nInitialParameters: Int = 10,
    val testSize: Double = 0.15,
    val parallelism: Int = 8,
    val seed: Long = 42,
    val speculate: Boolean = true
) {
  import AdaptiveSearch._

  def fit(df: DataFrame): AdaptiveResult = {
    val p = featureCols.size
    val (trainDf, testDf) = Splits.trainTestSplit(df, testSize, seed = seed)
    val train = trainDf
      .select((featureCols :+ labelCol).map(c => col(c).cast("double")): _*)
      .rdd.map(r => (Array.tabulate(p)(r.getDouble), r.getDouble(p)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nParts = math.max(train.getNumPartitions, 1)
    // driver-size guard: the test set is collected by design (the
    // reference scatters it to every scoring task too) — fail fast if a
    // caller passes an unbounded frame instead of a held-out sample
    val testRows = testDf
      .select((featureCols :+ labelCol).map(c => col(c).cast("double")): _*)
      .limit(1000001).collect()
    require(testRows.length <= 1000000,
      "test set exceeds 1e6 rows; sample it before the adaptive search")
    val testX = testRows.map(r => Array.tabulate(p)(r.getDouble))
    val testY = testRows.map(_.getDouble(p))
    val sc = df.sparkSession.sparkContext
    val rnd = new scala.util.Random(seed)

    // the reference's shared deterministic block order
    // (_incremental.py:210-229): a seeded shuffle of the block ids,
    // re-shuffled and appended whenever a model's call count outruns
    // it. A model's training block depends ONLY on its call index, so
    // trajectories are identical whether a call ran speculatively, in
    // which thread, or in which round.
    val order = scala.collection.mutable.ArrayBuffer.empty[Int]
    def blockFor(callIdx: Int): Int = order.synchronized {
      while (callIdx >= order.length)
        order ++= rnd.shuffle((0 until nParts).toVector)
      order(callIdx)
    }

    val candidates = ParamGrid.sample(paramGrid, nInitialParameters, seed)
    val estimators = candidates.map(makeEstimator)
    var records = candidates.zipWithIndex.map { case (params, i) =>
      i -> ModelRecord(i, params, estimators(i).init(p), Vector.empty, 0)
    }.toMap

    val policy = makePolicy(records.size)
    val pool = Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // speculative futures run on their OWN pool: a round future blocks
    // on its model's speculative result, so sharing one pool could
    // queue the awaited future behind its awaiter (deadlock)
    val specPool = Executors.newFixedThreadPool(math.max(parallelism, 1))
    val specEc: ExecutionContext = ExecutionContext.fromExecutor(specPool)
    // (job group, canceled flag, result): the flag covers the window
    // cancelJobGroup can't — a launch still QUEUED behind the pool has
    // no Spark job to cancel yet, so it checks the flag at start and
    // aborts without ever submitting one (otherwise a culled model's
    // fit would run as a stray job, even after fit() returned)
    final case class SpecEntry(group: String,
        canceled: java.util.concurrent.atomic.AtomicBoolean,
        fut: Future[ModelRecord])
    val speculative =
      scala.collection.concurrent.TrieMap.empty[Int, SpecEntry]
    var totalPartialFits = 0
    var specLaunched = 0
    val specConsumed = new java.util.concurrent.atomic.AtomicInteger(0)
    val specCanceledInFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    var specCanceled = 0

    def partialFitOnce(id: Int, rec: ModelRecord): ModelRecord = {
      val est = estimators(id)
      val pid = blockFor(rec.calls)
      val cur = rec.state
      val newState = sc.runJob(train,
        (it: Iterator[(Array[Double], Double)]) => {
          val rows = it.toArray
          if (rows.isEmpty) cur
          else est.partialFit(cur, rows.map(_._1), rows.map(_._2))
        }, Seq(pid)).head
      rec.copy(state = newState, calls = rec.calls + 1)
    }

    /** Pre-launch the model's likely-next partial_fit
      * (_incremental.py:244-248): its own job group (the cancel
      * handle) + the "graft-speculation" FAIR pool (the priority=-1
      * analog). Thread-locals are cleared in finally — the pool thread
      * is reused.
      */
    def launchSpeculative(id: Int, rec: ModelRecord): Unit = {
      // JVM-globally unique per LAUNCH (not per (model, call), and not
      // per fit): cancelJobGroupAndFutureJobs poisons its group id
      // forever in the shared SparkContext, so no later launch — in
      // this fit or any other sharing the context (same seed included)
      // — may ever re-mint a canceled group's name
      val group =
        s"graft-spec-$seed-$id-${rec.calls}-${IncrementalSearchCV.specGroupSeq.incrementAndGet()}"
      val flag = new java.util.concurrent.atomic.AtomicBoolean(false)
      speculative.put(id, SpecEntry(group, flag, Future {
        if (flag.get()) throw new java.util.concurrent.CancellationException
        sc.setLocalProperty("spark.scheduler.pool", "graft-speculation")
        sc.setJobGroup(group, "speculative partial_fit", true)
        try {
          // re-check AFTER the group is set: a cancel that slipped past
          // the first check has already called
          // cancelJobGroupAndFutureJobs on this group, so either this
          // check sees the flag or the submitted job is dead on arrival
          // — no window remains for a stray job
          if (flag.get())
            throw new java.util.concurrent.CancellationException
          partialFitOnce(id, rec)
        } finally {
          sc.clearJobGroup()
          sc.setLocalProperty("spark.scheduler.pool", null)
        }
      }(specEc)))
    }

    def cancelSpeculative(id: Int): Unit =
      speculative.remove(id).foreach { e =>
        e.canceled.set(true) // queued launch aborts before submitting
        // ...AndFutureJobs: also kills a job submitted under the group
        // AFTER this call (the launch that passed the flag checks but
        // hadn't reached runJob yet)
        sc.cancelJobGroupAndFutureJobs(e.group)
        // parasitic: the swallow must not submit to specPool — at
        // loop-end cleanup the pool is shutting down and would reject
        // the callback (noisy, though harmless)
        e.fut.failed.foreach(_ => ())(ExecutionContext.parasitic)
        specCanceled += 1
      }

    try {
      // initial: one call each, then policy-controlled rounds; a model
      // absent from the policy's return is culled and its speculative
      // launch canceled (_incremental.py:299-303)
      var instructions: Map[Int, Int] = records.keys.map(_ -> 1).toMap
      var continue = instructions.nonEmpty
      while (continue) {
        val work = instructions.filter(_._2 > 0)
        val updated = Await.result(Future.sequence(work.toSeq.map { case (id, nCalls) =>
          Future {
            var rec = records(id)
            // a pending speculative launch IS this round's first call.
            // The launch was cut before last round's score was appended,
            // so graft its state/calls onto the SCORED record — history
            // must not lose a score to speculation.
            val consumed = speculative.remove(id) match {
              case Some(e) =>
                // a speculative launch can die in flight when the
                // group-cancel machinery races its submission
                // (cancelJobGroupAndFutureJobs kills a job submitted
                // under an already-canceled group). Speculation must
                // NEVER be able to fail the search: fall back to the
                // real call — block order is indexed by rec.calls, so
                // the redone fit is byte-identical — and account the
                // launch as canceled.
                scala.util.Try(Await.result(e.fut, Duration.Inf)) match {
                  case scala.util.Success(spec) =>
                    rec = spec.copy(scores = rec.scores)
                    specConsumed.incrementAndGet()
                    1
                  case scala.util.Failure(
                      _: java.util.concurrent.CancellationException) =>
                    specCanceledInFlight.incrementAndGet()
                    0
                  case scala.util.Failure(ex: org.apache.spark.SparkException)
                      if ex.getMessage != null &&
                        ex.getMessage.contains("cancelled") =>
                    specCanceledInFlight.incrementAndGet()
                    0
                  case scala.util.Failure(ex) =>
                    // anything else is a GENUINE fit failure — the
                    // non-speculative path would have thrown it too;
                    // masking it would hide real errors
                    throw ex
                }
              case None => 0
            }
            (consumed until nCalls).foreach { _ =>
              rec = partialFitOnce(id, rec)
            }
            // launch the next speculative call BEFORE scoring: the
            // driver-local score pass is exactly the latency window the
            // reference's priority=-1 submit hides
            if (speculate) launchSpeculative(id, rec)
            val score = scorer(estimators(id).model(rec.state), testX, testY)
            rec.copy(scores = rec.scores :+ score)
          }
        }), Duration.Inf)
        totalPartialFits += work.values.sum
        if (speculate) specLaunched += work.size
        records = records ++ updated.map(r => r.id -> r)
        // the policy sees every RETAINED model — including ones it
        // gave 0 calls (done-but-kept, e.g. plateaued high performers:
        // _incremental.py keeps them in `info`; only models ABSENT
        // from the returned dict are culled)
        val retained = instructions.keySet
        instructions = policy.additionalCalls(
          records.filter { case (id, _) => retained(id) })
        // culled models (absent) and stopped models (0 calls): their
        // pre-launched work is dead — cancel the job group
        speculative.keys.foreach { id =>
          if (instructions.getOrElse(id, 0) <= 0) cancelSpeculative(id)
        }
        continue = instructions.values.exists(_ > 0)
      }
      val best = records.values.maxBy(_.lastScore)
      AdaptiveResult(records.values.toSeq.sortBy(_.id),
        best.params, best.lastScore,
        estimators(best.id).model(best.state), totalPartialFits,
        SpeculationStats(specLaunched, specConsumed.get(),
          specCanceled + specCanceledInFlight.get()))
    } finally {
      speculative.keys.foreach(cancelSpeculative)
      pool.shutdown()
      specPool.shutdown()
      train.unpersist(blocking = false)
    }
  }
}

/** Speculative pre-launch accounting: launched ≥ consumed + canceled
  * (a launch still in flight at loop end is canceled by cleanup).
  */
case class SpeculationStats(launched: Int, consumed: Int, canceled: Int)

case class AdaptiveResult(
    history: Seq[AdaptiveSearch.ModelRecord],
    bestParams: Map[String, Any],
    bestScore: Double,
    bestModel: LocalModel,
    totalPartialFits: Int,
    speculation: SpeculationStats = SpeculationStats(0, 0, 0))

/** SuccessiveHalvingSearchCV facade (_successive_halving.py). */
class SuccessiveHalvingSearchCV(
    makeEstimator: Map[String, Any] => OnlineEstimator,
    paramGrid: Map[String, Seq[Any]],
    featureCols: Seq[String], labelCol: String,
    scorer: (LocalModel, Array[Array[Double]], Array[Double]) => Double,
    val nInitial: Int = 9, val r: Int = 1, val eta: Double = 3.0,
    testSize: Double = 0.15, seed: Long = 42,
    speculate: Boolean = true
) {
  def fit(df: DataFrame): AdaptiveResult =
    new IncrementalSearchCV(makeEstimator, paramGrid, featureCols, labelCol,
      scorer, _ => new AdaptiveSearch.SuccessiveHalving(nInitial, r, eta),
      nInitial, testSize, seed = seed, speculate = speculate).fit(df)
}

/** HyperbandSearchCV (_hyperband.py:58-664): all SHA brackets run
  * CONCURRENTLY (the reference gathers them via `asyncio.gather`,
  * _hyperband.py:425-427) — each bracket is a Future on a driver pool
  * and tags its Spark jobs with a per-bracket scheduler pool name, so
  * under FAIR scheduling the cluster time-shares brackets instead of
  * head-of-line-blocking on the largest one (under the default FIFO
  * scheduler the jobs still interleave across brackets; the tag is then
  * inert). Results merged, best model over all brackets wins.
  */
class HyperbandSearchCV(
    makeEstimator: Map[String, Any] => OnlineEstimator,
    paramGrid: Map[String, Seq[Any]],
    featureCols: Seq[String], labelCol: String,
    scorer: (LocalModel, Array[Array[Double]], Array[Double]) => Double,
    val maxIter: Int = 9, val eta: Double = 3.0,
    testSize: Double = 0.15, seed: Long = 42,
    val concurrentBrackets: Boolean = true,
    val speculate: Boolean = true
) {
  def metadata: Seq[(Int, Int, Int)] = AdaptiveSearch.hyperbandMetadata(maxIter, eta)

  def fit(df: DataFrame): AdaptiveResult = {
    val brackets = AdaptiveSearch.hyperbandParams(maxIter, eta)
    val sc = df.sparkSession.sparkContext
    def runBracket(bracket: ((Int, Int, Int), Int)): AdaptiveResult = {
      val ((_, n, r), i) = bracket
      sc.setLocalProperty("spark.scheduler.pool", s"hyperband-bracket-$i")
      try new IncrementalSearchCV(makeEstimator, paramGrid, featureCols, labelCol,
        scorer, _ => new AdaptiveSearch.SuccessiveHalving(n, math.max(r, 1), eta),
        n, testSize, seed = seed + i, speculate = speculate).fit(df)
      finally sc.setLocalProperty("spark.scheduler.pool", null)
    }
    val results =
      if (!concurrentBrackets) brackets.zipWithIndex.map(runBracket)
      else {
        val pool = Executors.newFixedThreadPool(brackets.size)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        try Await.result(
          Future.sequence(brackets.zipWithIndex.map(b => Future(runBracket(b)))),
          Duration.Inf)
        finally pool.shutdown()
      }
    val best = results.maxBy(_.bestScore)
    AdaptiveResult(results.flatMap(_.history), best.bestParams, best.bestScore,
      best.bestModel, results.map(_.totalPartialFits).sum,
      SpeculationStats(
        results.map(_.speculation.launched).sum,
        results.map(_.speculation.consumed).sum,
        results.map(_.speculation.canceled).sum))
  }
}
