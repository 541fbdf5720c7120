package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Metric functions as single-pass DataFrame aggregates
  * (ref: dask_ml/metrics/). Each is one `agg` → one partial+final
  * hash-aggregate job; optionally sample-weighted. The reference computes
  * these as dask reductions (e.g. regression.py:34-59); in Spark the
  * entire metric fuses into one codegen'd pass over the scan.
  */
object Metrics {

  private def weighted(err: Column, weight: Option[Column]): Column =
    weight match {
      case Some(w) => sum(err * w) / sum(w)
      case None => avg(err)
    }

  // ---- regression (ref: metrics/regression.py) ----

  /** regression.py:34-59; squared=false → RMSE. */
  def meanSquaredError(df: DataFrame, yTrue: String, yPred: String,
      sampleWeight: Option[String] = None, squared: Boolean = true): Double = {
    val mse = df.agg(weighted(pow(col(yPred) - col(yTrue), 2),
      sampleWeight.map(col))).head().getDouble(0)
    if (squared) mse else math.sqrt(mse)
  }

  /** regression.py:62-84. */
  def meanAbsoluteError(df: DataFrame, yTrue: String, yPred: String,
      sampleWeight: Option[String] = None): Double =
    df.agg(weighted(abs(col(yPred) - col(yTrue)), sampleWeight.map(col)))
      .head().getDouble(0)

  /** regression.py:87-147: |err| / max(|y|, eps). */
  def meanAbsolutePercentageError(df: DataFrame, yTrue: String, yPred: String,
      sampleWeight: Option[String] = None): Double = {
    val eps = 2.220446049250313e-16 // np.finfo(np.float64).eps
    df.agg(weighted(abs(col(yPred) - col(yTrue)) / greatest(abs(col(yTrue)), lit(eps)),
      sampleWeight.map(col))).head().getDouble(0)
  }

  /** regression.py:150-174 with the 0/0→1, den=0→0 guards. Single pass:
    * ss_tot via the sum-of-squares identity (no global window, which
    * would collapse to one partition at scale).
    */
  def r2Score(df: DataFrame, yTrue: String, yPred: String): Double = {
    val row = df.agg(
      sum(pow(col(yTrue) - col(yPred), 2)),
      sum(pow(col(yTrue), 2)), sum(col(yTrue)), count(lit(1))).head()
    val num = row.getDouble(0)
    val den = row.getDouble(1) - math.pow(row.getDouble(2), 2) / row.getLong(3)
    if (den == 0.0) { if (num == 0.0) 1.0 else 0.0 } else 1.0 - num / den
  }

  /** regression.py:177-192: MSE on log1p. */
  def meanSquaredLogError(df: DataFrame, yTrue: String, yPred: String,
      sampleWeight: Option[String] = None): Double =
    df.agg(weighted(pow(log1p(col(yPred)) - log1p(col(yTrue)), 2),
      sampleWeight.map(col))).head().getDouble(0)

  /** Multioutput regression metrics (the reference's `multioutput=`
    * surface, regression.py 34-147 + tests/metrics/test_regression.py):
    * `"raw_values"` → one value per (yTrue, yPred) output pair,
    * `"uniform_average"` → their unweighted mean. Weighted multioutput
    * is unsupported exactly like the reference (raises). All outputs
    * aggregate in ONE pass over the data.
    *
    * `metric` ∈ mse | rmse | mae | mape | msle.
    */
  def regressionMulti(df: DataFrame, metric: String,
      yTrues: Seq[String], yPreds: Seq[String],
      multioutput: String = "uniform_average"): Array[Double] = {
    require(yTrues.nonEmpty && yTrues.length == yPreds.length,
      "yTrues and yPreds must be equal-length and non-empty")
    checkMultioutput(multioutput)
    val eps = 2.220446049250313e-16
    val exprs = yTrues.zip(yPreds).map { case (t, p) =>
      metric match {
        case "mse" => avg(pow(col(p) - col(t), 2))
        case "rmse" => sqrt(avg(pow(col(p) - col(t), 2)))
        case "mae" => avg(abs(col(p) - col(t)))
        case "mape" => avg(abs(col(p) - col(t)) / greatest(abs(col(t)), lit(eps)))
        case "msle" => avg(pow(log1p(col(p)) - log1p(col(t)), 2))
        case other => throw new IllegalArgumentException(
          s"unknown multioutput metric $other; known: mse, rmse, mae, mape, msle")
      }
    }
    val row = df.agg(exprs.head, exprs.tail: _*).head()
    val raw = yTrues.indices.map(row.getDouble).toArray
    if (multioutput == "raw_values") raw
    else Array(raw.sum / raw.length)
  }

  /** Multioutput r2 — like the reference, ONLY uniform_average is
    * supported (tests/metrics/test_regression.py: r2 with raw_values /
    * weights raises "'multioutput' must be 'uniform_average'"). The
    * per-output r2 terms use the same single-pass sum-of-squares
    * identity as [[r2Score]], all outputs in one aggregate job.
    */
  def r2ScoreMulti(df: DataFrame, yTrues: Seq[String], yPreds: Seq[String],
      multioutput: String = "uniform_average"): Double = {
    require(yTrues.nonEmpty && yTrues.length == yPreds.length,
      "yTrues and yPreds must be equal-length and non-empty")
    if (multioutput != "uniform_average")
      throw new NotImplementedError("'multioutput' must be 'uniform_average'")
    val exprs = yTrues.zip(yPreds).flatMap { case (t, p) =>
      Seq(sum(pow(col(t) - col(p), 2)), sum(pow(col(t), 2)), sum(col(t)))
    } :+ count(lit(1))
    val row = df.agg(exprs.head, exprs.tail: _*).head()
    val n = row.getLong(exprs.length - 1)
    val r2s = yTrues.indices.map { i =>
      val num = row.getDouble(3 * i)
      val den = row.getDouble(3 * i + 1) - math.pow(row.getDouble(3 * i + 2), 2) / n
      if (den == 0.0) { if (num == 0.0) 1.0 else 0.0 } else 1.0 - num / den
    }
    r2s.sum / r2s.length
  }

  private def checkMultioutput(m: String): Unit = m match {
    case "raw_values" | "uniform_average" => ()
    case _ => throw new NotImplementedError("Weighted 'multioutput' not supported.")
  }

  // ---- classification (ref: metrics/classification.py) ----

  /** classification.py:12-94. normalize=false returns the raw hit count. */
  def accuracyScore(df: DataFrame, yTrue: String, yPred: String,
      sampleWeight: Option[String] = None, normalize: Boolean = true): Double = {
    val hit = when(col(yTrue) === col(yPred), 1.0).otherwise(0.0)
    val agg = (sampleWeight, normalize) match {
      case (Some(w), true) => sum(hit * col(w)) / sum(col(w))
      case (Some(w), false) => sum(hit * col(w))
      case (None, true) => avg(hit)
      case (None, false) => sum(hit)
    }
    df.agg(agg).head().getDouble(0)
  }

  /** classification.py:97-153 — binary log loss on a probability column
    * (probability of the positive class), clipped like sklearn.
    */
  def logLoss(df: DataFrame, yTrue: String, probCol: String,
      sampleWeight: Option[String] = None, eps: Double = 1e-15): Double = {
    val p = least(greatest(col(probCol), lit(eps)), lit(1 - eps))
    val y = col(yTrue).cast("double")
    val ll = -(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p))
    df.agg(weighted(ll, sampleWeight.map(col))).head().getDouble(0)
  }

  /** classification.py:97-153 — MULTICLASS log loss: `yTrue` is a class
    * index, `probsCol` an array<double> of per-class scores. Like
    * sklearn: clip each probability to [eps, 1−eps], renormalize the row
    * to sum 1, then −log p(true class), sample-weighted mean. One fused
    * aggregate pass.
    */
  def logLossMulti(df: DataFrame, yTrue: String, probsCol: String,
      sampleWeight: Option[String] = None, eps: Double = 1e-15): Double = {
    val clipped = transform(col(probsCol),
      p => least(greatest(p, lit(eps)), lit(1 - eps)))
    val total = aggregate(clipped, lit(0.0), (acc, p) => acc + p)
    val py = element_at(clipped, col(yTrue).cast("int") + 1) / total
    df.agg(weighted(-log(py), sampleWeight.map(col))).head().getDouble(0)
  }

  // ---- classifier evaluation beyond the reference surface ----
  // (the trained quality / language classifiers this library ships
  // need confusion / per-class PRF / ranking metrics to be judged;
  // sklearn semantics, Spark-shaped plans)

  /** Confusion matrix as a long-form frame (label, pred, n): ONE
    * hash-aggregate over ≤ |classes|² keys — no pivot, no collect.
    */
  def confusionMatrix(df: DataFrame, yTrue: String, yPred: String): DataFrame =
    df.groupBy(col(yTrue).as("label"), col(yPred).as("pred"))
      .agg(count(lit(1)).as("n"))

  /** Per-class precision / recall / F1 from one confusion aggregate:
    * tp from the diagonal, fp/fn from per-pred / per-label marginals —
    * three tiny grouped sums over the ≤ |classes|² confusion frame,
    * outer-joined on the class key (a class never predicted, or never
    * true, still gets its row with the sklearn zero-division=0
    * convention). Output: (class, tp, fp, fn, precision, recall, f1),
    * doubles rounded to 6.
    */
  def precisionRecallF1(df: DataFrame, yTrue: String, yPred: String): DataFrame = {
    val cm = confusionMatrix(df, yTrue, yPred)
    val tp = cm.filter(col("label") === col("pred"))
      .select(col("label").as("clazz"), col("n").as("tp"))
    val byLabel = cm.groupBy(col("label").as("clazz"))
      .agg(sum(col("n")).as("n_true"))
    val byPred = cm.groupBy(col("pred").as("clazz"))
      .agg(sum(col("n")).as("n_pred"))
    val z = lit(0L)
    byLabel.join(byPred, Seq("clazz"), "full_outer")
      .join(tp, Seq("clazz"), "left_outer")
      .select(col("clazz"),
        coalesce(col("tp"), z).as("tp"),
        (coalesce(col("n_pred"), z) - coalesce(col("tp"), z)).as("fp"),
        (coalesce(col("n_true"), z) - coalesce(col("tp"), z)).as("fn"))
      .withColumn("precision", round(when(col("tp") + col("fp") === 0, 0.0)
        .otherwise(col("tp").cast("double") / (col("tp") + col("fp"))), 6))
      .withColumn("recall", round(when(col("tp") + col("fn") === 0, 0.0)
        .otherwise(col("tp").cast("double") / (col("tp") + col("fn"))), 6))
      .withColumn("f1", round(when(col("precision") + col("recall") === 0, 0.0)
        .otherwise(lit(2.0) * col("precision") * col("recall")
          / (col("precision") + col("recall"))), 6))
  }

  /** Binary ROC-AUC as the tie-aware Mann–Whitney U statistic:
    * AUC = (Σ avgrank(positives) − P(P+1)/2) / (P·N). The global
    * ranking the textbook formula implies is NOT materialized —
    * scores aggregate to ≤ |distinct scores| (cnt, pos) rows first and
    * the rank window runs over that aggregate frame only (the same
    * two-stage shape as Curriculum.budgetSelect), so the corpus pays
    * one hash aggregate and no sort at any size. A score group's
    * members share the average rank cumBefore + (cnt+1)/2, which is
    * exactly the tie convention sklearn's roc_auc_score implements.
    * NaN when only one class is present (sklearn raises; callers gate).
    */
  def rocAuc(df: DataFrame, yTrue: String, scoreCol: String): Double = {
    val g = df.groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).cast("double").as("cnt"),
        sum(col(yTrue).cast("double")).as("pos"))
    // the per-score frame is corpus-sized for near-unique scores: the
    // cumulative rank runs as a range-partitioned two-pass prefix sum
    // (guide §2, r15), never a single-partition window. cnt is an
    // integer-valued double, so the regrouped accumulation is exact.
    val r = graft.core.Prefix.cumSums(g, Seq(col("s")),
        Seq((col("cnt"), "cb", false)))
      .agg(
        sum(col("pos") * (col("cb") + (col("cnt") + 1) / 2)).as("rank_sum"),
        sum(col("pos")).as("p"), sum(col("cnt")).as("n")).head()
    val (rankSum, p, n) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    val neg = n - p
    if (p == 0 || neg == 0) Double.NaN
    else (rankSum - p * (p + 1) / 2) / (p * neg)
  }

  /** Average precision (PR-AUC) in sklearn's step form
    * AP = Σ_n (R_n − R_{n−1})·P_n over DESCENDING score thresholds,
    * tie groups collapsed into one threshold — computed like
    * [[rocAuc]]: scores aggregate to (cnt, pos) per distinct value
    * first, the cumulative window runs over that aggregate frame only,
    * and AP = Σ_g pos_g·(cumtp_g/cumall_g) / P. No corpus sort.
    * NaN when no positives exist.
    */
  def averagePrecision(df: DataFrame, yTrue: String, scoreCol: String): Double = {
    val g = df.groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).cast("double").as("cnt"),
        sum(col(yTrue).cast("double")).as("pos"))
    // two-pass prefix sums over the per-score frame (see rocAuc): both
    // addends are integer-valued doubles, regrouping is exact
    val r = graft.core.Prefix.cumSums(g, Seq(col("s").desc),
        Seq((col("pos"), "cumtp", true), (col("cnt"), "cumall", true)))
      .agg(sum(col("pos") * col("cumtp") / col("cumall")).as("num"),
        sum(col("pos")).as("p")).head()
    val (num, p) = (r.getDouble(0), r.getDouble(1))
    if (p == 0) Double.NaN else num / p
  }

  /** Calibration reliability bins for a probability column: bin
    * b = min(floor(p·nBins), nBins−1), per-bin count / mean predicted
    * probability / empirical positive rate / absolute gap — ONE hash
    * aggregate over ≤ nBins keys (the expected-calibration-error sum
    * Σ n_b/N·|conf_b − acc_b| is a trivial second pass over the bin
    * frame, [[expectedCalibrationError]]). Doubles rounded to 6.
    */
  def calibrationBins(df: DataFrame, yTrue: String, probCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val b = least(floor(col(probCol) * nBins), lit(nBins - 1)).cast("int")
    df.groupBy(b.as("bin"))
      .agg(count(lit(1)).as("n"),
        round(avg(col(probCol)), 6).as("mean_p"),
        round(avg(col(yTrue).cast("double")), 6).as("frac_pos"))
      .withColumn("gap", round(abs(col("mean_p") - col("frac_pos")), 6))
  }

  /** ECE over [[calibrationBins]]' ROUNDED per-bin stats (so the
    * scalar is the exact weighted sum of the frame a caller inspects).
    */
  def expectedCalibrationError(df: DataFrame, yTrue: String, probCol: String,
      nBins: Int = 10): Double = {
    val bins = calibrationBins(df, yTrue, probCol, nBins)
    val r = bins.agg(sum(col("n") * col("gap")).as("num"),
      sum(col("n")).as("n")).head()
    r.getDouble(0) / r.getLong(1)
  }

  // ---- r2 without a window (exposed for the query pack) ----
  /** Two-aggregate single-pass r2: E[y], E[y²], E[(y-p)²]. */
  def r2Expr(yTrue: Column, yPred: Column): Column = {
    val ssRes = sum(pow(yTrue - yPred, 2))
    val ssTot = sum(pow(yTrue, 2)) - pow(sum(yTrue), 2) / count(lit(1))
    lit(1.0) - ssRes / ssTot
  }

  /** NDCG per query over a ranked candidate frame (queryCol, rankCol
    * 1-based, relCol ≥ 0) — the retrieval-quality number behind
    * BM25/ANN evaluation:  DCG = Σ rel_i / log2(rank_i + 1), IDCG the
    * same sum under the ideal (rel-descending) permutation, computed
    * with ONE row_number window over the per-query candidate set
    * (k rows per query — never the corpus). log2 is ln/ln2 in both
    * engines (identical operand order). Zero-relevance queries return
    * 0 (the sklearn convention). Output: (queryCol, ndcg rounded 6).
    */
  def ndcgPerQuery(df: DataFrame, queryCol: String, rankCol: String,
      relCol: String): DataFrame = {
    val ln2 = log(lit(2.0))
    val ideal = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryCol))
      .orderBy(col(relCol).desc, col(rankCol))
    df.withColumn("__ir", row_number().over(ideal))
      .groupBy(col(queryCol))
      .agg(
        sum(col(relCol).cast("double") / (log(col(rankCol) + 1) / ln2)).as("__dcg"),
        sum(col(relCol).cast("double") / (log(col("__ir") + 1) / ln2)).as("__idcg"))
      .select(col(queryCol),
        round(when(col("__idcg") === 0, 0.0)
          .otherwise(col("__dcg") / col("__idcg")), 6).as("ndcg"))
  }

  /** Per-query retrieval report over a ranked candidate frame
    * (queryCol, rankCol 1-based, relCol 0/1) with a per-query count of
    * relevant corpus items (`totalRelCol`, for recall's denominator):
    * MRR contribution = 1/first-relevant-rank (0 when none),
    * precision@k = hits/k, recall@k = hits/totalRel. One grouped
    * aggregate over the k-row-per-query frame — min() picks the first
    * relevant rank, no window at all. Output: (queryCol, mrr, p_at_k,
    * r_at_k), rounded 6.
    */
  def retrievalReport(df: DataFrame, queryCol: String, rankCol: String,
      relCol: String, totalRelCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.groupBy(col(queryCol))
      .agg(
        min(when(col(relCol) === 1, col(rankCol))).as("__fr"),
        sum(col(relCol).cast("long")).as("__hits"),
        max(col(totalRelCol)).as("__tot"))
      .select(col(queryCol),
        round(coalesce(lit(1.0) / col("__fr"), lit(0.0)), 6).as("mrr"),
        round(col("__hits").cast("double") / k, 6).as(s"p_at_$k"),
        round(when(col("__tot") === 0, 0.0)
          .otherwise(col("__hits").cast("double") / col("__tot")), 6)
          .as(s"r_at_$k"))
  }

  /** Multiclass agreement statistics from ONE confusion aggregate —
    * the Gorodkin (2004) R_K generalization of Matthews' correlation
    * plus Cohen's kappa, both closed forms over the class marginals:
    *
    *   MCC   = (c·s − Σ_k t_k·p_k) / sqrt((s² − Σp_k²)(s² − Σt_k²))
    *   kappa = (p_o − p_e)/(1 − p_e),  p_o = c/s,  p_e = Σ t_k·p_k / s²
    *
    * where s = total, c = diagonal sum, t_k / p_k = per-class true /
    * predicted counts. The corpus is reduced to a ≤|classes|² confusion
    * frame first; everything after runs on that tiny frame (full-outer
    * marginal join — a class never predicted, or never true, still
    * contributes its t_k or p_k). Degenerate denominators (single-class
    * truth or prediction) return 0.0, sklearn's convention.
    * Returns (mcc, kappa).
    */
  def agreementStats(df: DataFrame, yTrue: String, yPred: String): (Double, Double) = {
    val cm = confusionMatrix(df, yTrue, yPred).cache()
    try {
      val tot = cm.agg(sum(col("n")).as("s"),
        sum(when(col("label") === col("pred"), col("n")).otherwise(0L)).as("c")).head()
      val s = tot.getLong(0).toDouble; val c = tot.getLong(1).toDouble
      val marg = cm.groupBy(col("label").as("clazz")).agg(sum(col("n")).as("t"))
        .join(cm.groupBy(col("pred").as("clazz")).agg(sum(col("n")).as("p")),
          Seq("clazz"), "full_outer")
        .select(coalesce(col("t"), lit(0L)).cast("double").as("t"),
          coalesce(col("p"), lit(0L)).cast("double").as("p"))
        .agg(sum(col("t") * col("p")).as("tp"),
          sum(col("t") * col("t")).as("tt"),
          sum(col("p") * col("p")).as("pp")).head()
      val (tp, tt, pp) = (marg.getDouble(0), marg.getDouble(1), marg.getDouble(2))
      val mccDen = math.sqrt((s * s - pp) * (s * s - tt))
      val mcc = if (mccDen == 0.0) 0.0 else (c * s - tp) / mccDen
      val pe = tp / (s * s)
      val kappa = if (pe == 1.0) 0.0 else (c / s - pe) / (1.0 - pe)
      (mcc, kappa)
    } finally { cm.unpersist(); () }
  }
  /** Temperature-scaling calibration scan (Guo, Pleiss, Sun &
    * Weinberger ICML'17): binary NLL of the sigmoid at margin/T for
    * every T in a literal grid, in ONE corpus pass — the post-hoc
    * calibration fit a model-card pipeline runs after training (the
    * continuous-optimizer form is this scan with a finer grid; the
    * NLL in T is convex so a grid bracket is the standard production
    * shortcut). Numerically via the softplus identities
    *
    *   −ln σ(z)     = ln(1 + e^{−z})
    *   −ln(1−σ(z))  = z + ln(1 + e^{−z})
    *
    * so no probability is ever materialized near 0/1. Each row fans
    * out to |grid| (T, term) pairs scan-fused; the aggregate is
    * ≤|grid| rows. `is_best` marks the rounded-NLL argmin (ties to
    * the smaller T) via a broadcast 1-row min-struct — no window.
    *
    * @param marginCol pre-sigmoid logit/margin column
    * @param temps     temperature grid (must be non-empty, positive)
    */
  def temperatureScan(df: DataFrame, yTrue: String, marginCol: String,
      temps: Seq[Double]): DataFrame = {
    require(temps.nonEmpty && temps.forall(_ > 0),
      s"need a non-empty positive temperature grid, got $temps")
    val pairs = temps.map { t =>
      val z = col(marginCol).cast("double") / lit(t)
      // overflow-safe softplus: ln(1+e^{-z}) = max(-z,0) + ln(1+e^{-|z|})
      // — the naive form hits exp-overflow (Inf) for z < -709; here the
      // exponent is always ≤ 0 so exp never overflows and underflow
      // degrades gracefully to 0
      val softplus = greatest(-z, lit(0.0)) + log(lit(1.0) + exp(-abs(z)))
      struct(lit(t).as("t"),
        (when(col(yTrue).cast("double") > 0, softplus)
          .otherwise(z + softplus)).as("term"))
    }
    val scan = df
      .select(explode(array(pairs: _*)).as("__e"))
      .select(col("__e.t").as("t"), col("__e.term").as("__term"))
      .groupBy("t")
      .agg(round(avg("__term"), 6).as("nll"))
    val best = broadcast(
      scan.agg(min(struct(col("nll"), col("t"))).as("__b")))
    scan.crossJoin(best)
      .select(col("t"), col("nll"),
        (col("t") === col("__b.t")).as("is_best"))
  }
}

/** Ref: dask_ml.metrics.scorer (metrics/scorer.py:8-77): name → scorer
  * registry. Scorers take (df, yTrue, yPred-or-prob) and return Double,
  * greater-is-better (negated where sklearn negates).
  */
object Scorer {
  type ScoreFn = (DataFrame, String, String) => Double

  val scorers: Map[String, ScoreFn] = Map(
    "accuracy" -> ((df, t, p) => Metrics.accuracyScore(df, t, p)),
    "neg_mean_squared_error" -> ((df, t, p) => -Metrics.meanSquaredError(df, t, p)),
    "neg_root_mean_squared_error" ->
      ((df, t, p) => -Metrics.meanSquaredError(df, t, p, squared = false)),
    "neg_mean_absolute_error" -> ((df, t, p) => -Metrics.meanAbsoluteError(df, t, p)),
    "neg_mean_squared_log_error" -> ((df, t, p) => -Metrics.meanSquaredLogError(df, t, p)),
    "r2" -> ((df, t, p) => Metrics.r2Score(df, t, p)),
    "neg_log_loss" -> ((df, t, p) => -Metrics.logLoss(df, t, p)),
    // beyond the reference registry: ranking metric for the trained
    // quality/langid classifiers (third arg = score column)
    "roc_auc" -> ((df, t, p) => Metrics.rocAuc(df, t, p))
  )

  def getScorer(name: String): ScoreFn =
    scorers.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown scorer $name; known: ${scorers.keys.mkString(", ")}"))

}
