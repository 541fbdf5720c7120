package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.wrappers.{OnlineEstimator, OnlineState}

/** Structured-Streaming adapters (SURVEY.md §2.9 streaming note): the
  * reference has no stream processing; its closest semantic is
  * block-sequential incremental learning (`partial_fit` chains). These
  * adapters expose exactly that over `readStream`:
  *
  *  - [[OnlineLearnerSink.foreachBatch]]: every micro-batch partial_fits
  *    the online learner — identical semantics to the reference's
  *    `Incremental` over an unbounded block sequence.
  *  - [[windowedAggregate]]: event-time tumbling window + watermark for
  *    the streaming statistics path (late data dropped past the
  *    watermark).
  */
object StreamingAdapter {

  /** Watermarked tumbling-window aggregation over an event stream. */
  def windowedAggregate(stream: DataFrame, tsCol: String, valueCol: String,
      windowDuration: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"),
        avg(col(valueCol)).as("avg_value"))
      .select(col("window.start").as("window_start"),
        col("n_events"), col("sum_value"), col("avg_value"))

  /** SLIDING event-time windows: each event lands in
    * windowDuration/slide overlapping windows.
    */
  def slidingWindowAggregate(stream: DataFrame, tsCol: String, valueCol: String,
      windowDuration: String = "1 hour", slide: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration, slide))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("n_events"), col("sum_value"))

  /** Per-key SESSION windows (gap-based): consecutive events of a key
    * merge while their spacing stays under `gap`. Runs streaming (with
    * the watermark bounding session state) or batch — where it matches
    * the classic lag/cumsum islands computation, which the DuckDB
    * oracle replays.
    */
  def sessionAggregate(stream: DataFrame, tsCol: String, valueCol: String,
      keyCol: String, gap: String = "5 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
      .select(col(keyCol), col("session_window.start").as("session_start"),
        col("n_events"), col("sum_value"))

  /** Stream-stream interval join: pair each left event with the right
    * events of the same key whose timestamp falls in
    * [leftTs − lookback, leftTs]. The time-bound join condition plus
    * both watermarks let Spark derive a state-eviction horizon — buffered
    * rows older than watermark − lookback are dropped, so join state is
    * BOUNDED regardless of stream length (the unbounded-state pitfall of
    * an unconstrained stream-stream equi-join). Batch frames run the
    * identical plan as an ordinary range-predicate join.
    *
    * Column names must be disjoint across the two sides (rename before
    * calling); `lookback` is an INTERVAL string, e.g. "10 minutes".
    */
  def streamingIntervalJoin(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, leftKey: String, rightKey: String,
      lookback: String, watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = if (left.isStreaming) left.withWatermark(leftTs, watermarkDelay)
      else left
    val r = if (right.isStreaming) right.withWatermark(rightTs, watermarkDelay)
      else right
    l.join(r, expr(s"$leftKey = $rightKey" +
      s" AND $rightTs >= $leftTs - INTERVAL $lookback" +
      s" AND $rightTs <= $leftTs"))
  }

  /** Per-key Welford state carried across micro-batches by
    * [[runningStats]]. `sumScaled` (Σ floor(value·10⁴) as integers) is
    * an ORDER-INDEPENDENT exact accumulator — integer addition
    * commutes, unlike the float mean/m2 — which is what the
    * correctness gate pins.
    */
  case class RunningState(n: Long, sumScaled: Long, mean: Double, m2: Double)

  case class RunningStatsRow(key: Long, n: Long, sum_scaled: Long,
      mean: Double, variance: Double)

  /** Custom streaming state via `flatMapGroupsWithState` (the
    * KeyValueGroupedDataset state API): per-key running count / scaled
    * integer sum / Welford mean+variance, updated each micro-batch and
    * emitted in Update mode. `expireAfter` bounds state for keys gone
    * idle (ProcessingTimeTimeout → the key's final row is emitted and
    * its state dropped — unbounded key spaces can't grow state
    * forever). The same plan executes in BATCH (each group's full
    * iterator in one call), which is what the oracle gate runs.
    */
  def runningStats(ds: DataFrame, keyCol: String, valueCol: String,
      expireAfter: Option[String] = None): Dataset[RunningStatsRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val timeout =
      if (expireAfter.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.select(col(keyCol).cast("long").as("k"),
        col(valueCol).cast("double").as("v"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[RunningState, RunningStatsRow](
        OutputMode.Update, timeout) {
        (key: Long, rows: Iterator[(Long, Double)], state: GroupState[RunningState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(RunningStatsRow(key, s.n, s.sumScaled, s.mean,
              if (s.n > 0) s.m2 / s.n else 0.0))
          } else {
            var s = state.getOption.getOrElse(RunningState(0L, 0L, 0.0, 0.0))
            rows.foreach { case (_, v) =>
              val n1 = s.n + 1
              val d = v - s.mean
              val mean1 = s.mean + d / n1
              s = RunningState(n1,
                s.sumScaled + math.floor(v * 10000).toLong,
                mean1, s.m2 + d * (v - mean1))
            }
            state.update(s)
            expireAfter.foreach(state.setTimeoutDuration)
            Iterator(RunningStatsRow(key, s.n, s.sumScaled, s.mean,
              if (s.n > 0) s.m2 / s.n else 0.0))
          }
      }
  }

  /** Streaming EXACT dedup — the streaming analog of
    * [[graft.llmdata.Dedup.exact]]: keep the first arrival of each key
    * within the watermark horizon (`dropDuplicatesWithinWatermark`), so
    * per-key state expires instead of growing without bound. On an
    * unbounded ingest stream this is the ingestion-time half of the
    * dedup story; the batch operators handle the full-corpus pass.
    */
  def streamingExactDedup(stream: DataFrame, keyCols: Seq[String],
      tsCol: String, watermarkDelay: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming fingerprint dedup: normalize text →
    * [[graft.llmdata.TextStats.fingerprint]] (md5 of
    * lowercase/punct-stripped/whitespace-collapsed text, the SAME
    * expression the batch path uses) and keep the first document per
    * fingerprint in the watermark horizon. State carries only the
    * 32-hex fingerprint per surviving key.
    */
  def streamingFingerprintDedup(stream: DataFrame, textCol: String,
      tsCol: String, watermarkDelay: String = "10 minutes"): DataFrame =
    stream
      .withColumn("fingerprint",
        graft.llmdata.TextStats.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(Seq("fingerprint"))

  /** One live LSH band bucket: the first document to claim the bucket
    * is its representative (one long of state per bucket).
    */
  case class LshBucketState(repId: Long)

  case class LshCandidate(doc_id: Long, rep_id: Long, band: Int)

  /** Streaming STATEFUL LSH near-dup detection — the ingestion-time
    * analog of [[graft.llmdata.Dedup.minhashNearDupPairs]]: each
    * arriving document computes its minhash signature (one scan-local
    * pass, the batch signature path reused verbatim) and claims its
    * `k/rowsPerBand` band buckets via `flatMapGroupsWithState` keyed on
    * (band, bandHash). The FIRST document in a bucket becomes its
    * representative; every later arrival emits an
    * `(arriving, representative, band)` candidate — the rows a
    * downstream stateless anti-join on `doc_id` drops to get the
    * deduped stream. Candidates are LSH-band matches WITHOUT the
    * exact-Jaccard verification the batch pipeline runs — the standard
    * ingestion-time recall/precision tradeoff; run the batch operator
    * for the verified pass.
    *
    * State discipline = the Welford precedent ([[runningStats]]):
    * one long per live bucket, `expireAfter` arms a processing-time
    * timeout so idle buckets forget their representative instead of
    * growing state forever (a later near-dup of an expired doc
    * re-enters — the horizon semantics of
    * `dropDuplicatesWithinWatermark`).
    *
    * The same code path executes in BATCH (each bucket's full iterator
    * in one call) — there, ids are visited in sorted order so the
    * representative is deterministically the bucket MIN, and the
    * candidate set provably covers the batch minhash family: a
    * verified pair (a < b) shares a band bucket whose representative
    * is ≤ a, so b always surfaces as a candidate
    * (StreamingLshDedupSpec pins this containment).
    */
  def streamingLshCandidates(stream: DataFrame, textCol: String,
      idCol: String, k: Int = 8, rowsPerBand: Int = 4, shingleN: Int = 3,
      expireAfter: Option[String] = None): Dataset[LshCandidate] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val sigs = graft.llmdata.Dedup.minhashSignatures(
      stream, textCol, idCol, k, shingleN)
    val bands = graft.llmdata.Dedup.bandHashes(sigs, idCol, k, rowsPerBand)
      .select(col(idCol).cast("long").as("doc"),
        col("band").cast("int").as("band"), col("bh"))
      .as[(Long, Int, String)]
    val timeout =
      if (expireAfter.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    bands.groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[LshBucketState, LshCandidate](
        OutputMode.Append, timeout) {
        case ((band, _), rows, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // sorted+distinct: deterministic representative (bucket
            // min) in batch mode and under any micro-batch iterator
            // order; a doc re-arriving as the rep emits nothing
            val ids = rows.map(_._1).toArray.distinct.sorted
            val rep = state.getOption.map(_.repId).getOrElse(ids.head)
            if (state.getOption.isEmpty) state.update(LshBucketState(rep))
            expireAfter.foreach(state.setTimeoutDuration)
            ids.iterator.filter(_ != rep)
              .map(d => LshCandidate(d, rep, band))
          }
      }
  }

  /** The deduped stream given the candidate relation: stateless
    * anti-join semantics — drop every document that surfaced as a
    * candidate. (For a true unbounded pipeline, route
    * [[streamingLshCandidates]] to a sink and anti-join batch-side, or
    * run it foreachBatch; stream-stream anti-joins on the live relation
    * are not expressible.)
    */
  def dropLshCandidates(docs: DataFrame, candidates: DataFrame,
      idCol: String): DataFrame =
    docs.join(candidates.select(col("doc_id").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** Streaming benchmark decontamination — the ingestion-time half of
    * [[graft.llmdata.Dedup.decontaminate]]: drop arriving documents
    * that share a word n-gram with the STATIC contamination set.
    *
    * Stream-static left_anti joins are unsupported (and an anti join on
    * EXPLODED shingles would be wrong anyway — it removes matching
    * shingle rows, not whole documents), so the static side is
    * collected ONCE at plan-build time — bounded by construction: the
    * contamination set is an eval suite, not a corpus — and checked
    * per row with `arrays_overlap` over the document's distinct
    * shingle set: a stateless, scan-fused, row-local hash-set probe.
    * No watermark state, so it composes freely in front of the
    * stateful dedup stages. Contamination sets beyond literal-plan
    * scale (≫10⁵ shingles) belong to the batch operator's broadcast
    * join instead.
    *
    * A document with NO shingles (shorter than n tokens) has nothing
    * to match and passes through — same semantics as the batch path.
    */
  def streamingDecontaminate(stream: DataFrame, textCol: String,
      contamination: DataFrame, contaminationTextCol: String,
      n: Int = 5): DataFrame = {
    val contam = contamination
      .select(explode(graft.llmdata.Dedup.shingleSetExpr(contaminationTextCol, n))
        .as("s"))
      .distinct().collect().map(_.getString(0))
    if (contam.isEmpty) stream
    else {
      val contamLit = array(contam.toIndexedSeq.map(lit): _*)
      stream.filter(
        !arrays_overlap(graft.llmdata.Dedup.shingleSetExpr(textCol, n), contamLit))
    }
  }

  /** Stateless skip-gram positives on a live stream: the window-pair
    * generation ([[graft.llmdata.SkipGram.positives]]) is a pure
    * per-document projection (two Generates + a filter, no aggregate,
    * no state), so the SAME operator body runs under a streaming plan
    * in append mode — ingest-time training-pair generation. Negative
    * sampling needs the FIT noise table; at stream time draw against
    * a batch-fit broadcast cum table (the trained-model convention).
    */
  def streamingSkipGramPositives(stream: DataFrame, textCol: String,
      idCol: String, window: Int = 2): DataFrame =
    graft.llmdata.SkipGram.positives(stream, textCol, idCol, window)

  /** Per-shard running token total carried across micro-batches by
    * [[streamingPackSequences]] — ONE long of state per shard.
    */
  case class PackState(cum: Long)

  case class PackedDoc(doc_id: Long, shard: String, n_tokens: Int,
      pack_id: Int, pack_offset: Int)

  /** Streaming sequence packing — the ingestion-time analog of
    * [[graft.llmdata.TextStats.packSequences]], closing the last batch
    * flagship stage without a streaming counterpart: assign each
    * arriving document to a fixed-budget training pack, per shard,
    * with the SAME arithmetic (pack = floor(cumBefore / budget), an
    * over-budget document overfills the open pack).
    *
    * Order contract: the batch operator packs in (shard, id) order; a
    * stream has no total order, so packing is id-ordered WITHIN each
    * micro-batch and arrival-ordered across batches — when ids arrive
    * monotonically (ingest sequence numbers), the streamed packing
    * equals the batch packing of the concatenated corpus exactly
    * (StreamingPackSpec pins this parity). The per-shard group is
    * buffered to sort by id — bounded by one micro-batch's shard
    * slice, not by history.
    *
    * State discipline: one long per shard (shard spaces are small and
    * long-lived — source/date buckets — so no timeout by default;
    * `expireAfter` arms the same processing-time expiry as
    * [[runningStats]] for unbounded shard keys, at the cost that a
    * re-appearing shard restarts its packs at 0).
    */
  def streamingPackSequences(stream: DataFrame, textCol: String,
      idCol: String, shardCol: String, budget: Int,
      expireAfter: Option[String] = None): Dataset[PackedDoc] = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = stream.sparkSession
    import spark.implicits._
    val timeout =
      if (expireAfter.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    stream.select(col(idCol).cast("long").as("id"),
        col(shardCol).cast("string").as("shard"),
        graft.llmdata.TextStats.tokenCount(col(textCol)).cast("int").as("n"))
      .as[(Long, String, Int)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[PackState, PackedDoc](
        OutputMode.Append, timeout) {
        (shard: String, rows: Iterator[(Long, String, Int)],
            state: GroupState[PackState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var cum = state.getOption.map(_.cum).getOrElse(0L)
            val out = rows.toArray.sortBy(_._1).map { case (id, _, n) =>
              val packId = (cum / budget).toInt
              val off = (cum - packId.toLong * budget).toInt
              cum += n
              PackedDoc(id, shard, n, packId, off)
            }
            state.update(PackState(cum))
            expireAfter.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }
}

/** Mutable holder driving an [[OnlineEstimator]] from a stream via
  * foreachBatch. Call [[attach]] on a streaming Dataset to get a
  * startable writer; [[state]] exposes the current learned state.
  */
class OnlineLearnerSink(
    val estimator: OnlineEstimator,
    val featureCols: Seq[String],
    val labelCol: String
) extends Serializable {
  @volatile private var current: OnlineState = estimator.init(featureCols.size)
  def state: OnlineState = current
  def model: graft.wrappers.LocalModel = estimator.model(current)

  /** Each micro-batch = one partial_fit chain over its partitions. The
    * batch is never `collect()`ed whole: partitions are visited
    * sequentially as single-partition jobs (the same pattern as
    * [[graft.wrappers.Incremental]]), so memory is bounded by one
    * partition regardless of trigger sizing, and the row sequence the
    * learner sees equals the old whole-batch collect (partitions in
    * order, rows in partition order).
    */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val p = featureCols.size
    val data = batch
      .select((featureCols :+ labelCol).map(c => col(c).cast("double")): _*)
      .rdd.map(r => (Array.tabulate(p)(r.getDouble), r.getDouble(p)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sc = batch.sparkSession.sparkContext
    val est = estimator
    var st = current
    var pid = 0
    val nParts = data.getNumPartitions
    while (pid < nParts) {
      val cur = st
      val res = sc.runJob(data,
        (it: Iterator[(Array[Double], Double)]) => {
          val rows = it.toArray
          if (rows.isEmpty) cur
          else est.partialFit(cur, rows.map(_._1), rows.map(_._2))
        }, Seq(pid))
      st = res.head
      pid += 1
    }
    data.unpersist(blocking = false)
    current = st
  }

  def attach(stream: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch(processBatch _)
}
