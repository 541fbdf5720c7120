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
  * On the reference's SPECULATIVE pre-launch (_incremental.py:244-248,
  * 323-327 — next-round partial_fits submitted at low priority before
  * the policy decides, canceled for culled models): that optimization
  * exists because dask's scoring and policy hops are themselves remote
  * round-trips the speculation can hide. Here scoring is a driver-local
  * array pass and the policy is pure arithmetic — there is no latency
  * window between a model's score returning and its next partial_fit
  * job being submitted, so speculation would only burn cluster slots on
  * soon-culled models. Deliberately omitted.
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
    * ⌈n₀/(1 + decayRate·t)⌉ models, one more call each; optional
    * patience: a model stops when its score hasn't improved by tol in
    * its last `patience` scores.
    */
  class InverseDecay(n0: Int, decayRate: Double = 1.0,
      patience: Int = Int.MaxValue, tol: Double = 1e-4,
      maxCalls: Int = 100) extends Policy {
    private var step = 0
    def additionalCalls(records: Map[Int, ModelRecord]): Map[Int, Int] = {
      step += 1
      val keep = math.max(1, math.ceil(n0 / (1.0 + decayRate * step)).toInt)
      val alive = records.values.toSeq.sortBy(-_.lastScore).take(keep)
      val out = alive.map { r =>
        val plateaued = r.scores.size > patience &&
          r.scores.takeRight(patience).max < r.scores.dropRight(patience).max + tol
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
    val seed: Long = 42
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

    val candidates = ParamGrid.sample(paramGrid, nInitialParameters, seed)
    val estimators = candidates.map(makeEstimator)
    var records = candidates.zipWithIndex.map { case (params, i) =>
      i -> ModelRecord(i, params, estimators(i).init(p), Vector.empty, 0)
    }.toMap

    val policy = makePolicy(records.size)
    val pool = Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    var totalPartialFits = 0

    try {
      // initial: one call each, then policy-controlled rounds; a model
      // absent from the policy's return is culled (its speculative work
      // would be canceled in the reference, _incremental.py:299-303)
      var instructions: Map[Int, Int] = records.keys.map(_ -> 1).toMap
      var continue = instructions.nonEmpty
      while (continue) {
        val work = instructions.filter(_._2 > 0)
        val updated = Await.result(Future.sequence(work.toSeq.map { case (id, nCalls) =>
          Future {
            var rec = records(id)
            val est = estimators(id)
            (0 until nCalls).foreach { _ =>
              val pid = rnd.synchronized(rnd.nextInt(nParts))
              val cur = rec.state
              val newState = sc.runJob(train,
                (it: Iterator[(Array[Double], Double)]) => {
                  val rows = it.toArray
                  if (rows.isEmpty) cur
                  else est.partialFit(cur, rows.map(_._1), rows.map(_._2))
                }, Seq(pid)).head
              rec = rec.copy(state = newState, calls = rec.calls + 1)
            }
            val score = scorer(est.model(rec.state), testX, testY)
            rec.copy(scores = rec.scores :+ score)
          }
        }), Duration.Inf)
        totalPartialFits += work.values.sum
        records = records ++ updated.map(r => r.id -> r)
        val alive = work.keySet
        instructions = policy.additionalCalls(
          records.filter { case (id, _) => alive(id) })
        continue = instructions.values.exists(_ > 0)
      }
      val best = records.values.maxBy(_.lastScore)
      AdaptiveResult(records.values.toSeq.sortBy(_.id),
        best.params, best.lastScore,
        estimators(best.id).model(best.state), totalPartialFits)
    } finally {
      pool.shutdown()
      train.unpersist(blocking = false)
    }
  }
}

case class AdaptiveResult(
    history: Seq[AdaptiveSearch.ModelRecord],
    bestParams: Map[String, Any],
    bestScore: Double,
    bestModel: LocalModel,
    totalPartialFits: Int)

/** SuccessiveHalvingSearchCV facade (_successive_halving.py). */
class SuccessiveHalvingSearchCV(
    makeEstimator: Map[String, Any] => OnlineEstimator,
    paramGrid: Map[String, Seq[Any]],
    featureCols: Seq[String], labelCol: String,
    scorer: (LocalModel, Array[Array[Double]], Array[Double]) => Double,
    val nInitial: Int = 9, val r: Int = 1, val eta: Double = 3.0,
    testSize: Double = 0.15, seed: Long = 42
) {
  def fit(df: DataFrame): AdaptiveResult =
    new IncrementalSearchCV(makeEstimator, paramGrid, featureCols, labelCol,
      scorer, _ => new AdaptiveSearch.SuccessiveHalving(nInitial, r, eta),
      nInitial, testSize, seed = seed).fit(df)
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
    val concurrentBrackets: Boolean = true
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
        n, testSize, seed = seed + i).fit(df)
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
      best.bestModel, results.map(_.totalPartialFits).sum)
  }
}
