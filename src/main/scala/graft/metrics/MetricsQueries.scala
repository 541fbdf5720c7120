package graft.metrics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryPack, Tables}
import graft.naivebayes.GaussianNB

/** Oracle-verified queries for metrics (§2.6) and GaussianNB (§2.2).
  * "Predictions" are deterministic column formulas so the oracle can
  * reproduce them.
  */
object MetricsQueries extends QueryPack {

  private def rounded(s: SparkSession, vals: Seq[(String, Double)]): DataFrame = {
    import s.implicits._
    vals.map { case (k, v) =>
      (k, BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("metric", "value").orderBy("metric")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Split conformal regression (Lei et al. JASA'18): OLS price~qty
    // fit on h60-bucket train split, |residual| 0.9-quantile on the
    // calibration split, empirical coverage on the test split — the
    // distribution-free interval report (metrics/Conformal.scala; the
    // asymptotic-level gate form, finite-sample level spec'd).
    "q_conformal_interval" -> ((s, dir) =>
      Conformal.splitConformalOls(Tables.lineitem(s, dir),
        "l_quantity", "l_extendedprice",
        concat(col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string")),
        salt = "conf", alpha = 0.1, finiteSample = false)),

    // Bucketed isotonic regression (metrics/Isotonic.scala): P(return)
    // vs ship time as a monotone step function — two corpus aggregates
    // (range, bucket rollup), then the PAV minimax identity over the
    // 20-bucket frame; binary labels keep every sum integral, so the
    // whole fit replays bit-for-bit in DuckDB.
    "q_isotonic_calibration" -> ((s, dir) =>
      Isotonic.fitBuckets(Tables.lineitem(s, dir),
        unix_micros(col("l_shipdate").cast("timestamp")),
        col("l_returnflag") === "R",
        nBuckets = 20)
        .orderBy("bucket")),

    // CUPED A/B readout (Deng et al. WSDM'13; metrics/Experiment.scala):
    // units are customers, variant = h60 bucket, y = post-1995 spend,
    // x = pre-1995 spend (the pre-experiment covariate). One per-unit
    // aggregate, one 1-row θ aggregate, one 2-row variant aggregate,
    // then pure arithmetic — Welch t on raw and adjusted means.
    "q_ab_cuped" -> ((s, dir) => {
      val per = Tables.orders(s, dir).groupBy(col("o_custkey")).agg(
        round(sum(when(col("o_orderdate") < lit("1995-01-01"),
          col("o_totalprice")).otherwise(0.0)), 6).as("x"),
        round(sum(when(col("o_orderdate") >= lit("1995-01-01"),
          col("o_totalprice")).otherwise(0.0)), 6).as("y"))
        .withColumn("variant", graft.core.Hashing.bucket(
          col("o_custkey").cast("string"), "ab", 2))
      Experiment.cupedReport(per, "variant", "y", "x")
    }),

    // Difference-in-differences on the 2×2 (hash-variant × pre/post
    // 1995) design over order totals — one grouped aggregate to the 4
    // cells, OLS-interaction SE, cell stats rounded at the handoff.
    "q_diff_in_diff" -> ((s, dir) =>
      Experiment.diffInDiff(Tables.orders(s, dir),
        graft.core.Hashing.bucket(
          col("o_custkey").cast("string"), "ab", 2) === 1,
        col("o_orderdate") >= lit("1995-01-01"), "o_totalprice")),

    // Sample-ratio-mismatch guardrail on the same hash variants
    // (designed 50/50): per-variant observed vs expected with
    // chi-square terms — the trust check before any effect readout.
    "q_ab_srm" -> ((s, dir) =>
      Experiment.srmCheck(Tables.orders(s, dir)
          .withColumn("variant", graft.core.Hashing.bucket(
            col("o_custkey").cast("string"), "ab", 2)),
        "variant", Map("0" -> 0.5, "1" -> 0.5))
        .orderBy("variant")),

    // Mann–Whitney U on the quantity metric between hash variants
    // (Experiment.mannWhitneyU): the distribution-free A/B readout,
    // computed from value-level counts — U, tie-corrected sigma and z
    // without ever ranking the corpus.
    "q_ab_mannwhitney" -> ((s, dir) =>
      Experiment.mannWhitneyU(Tables.lineitem(s, dir)
          .withColumn("variant", graft.core.Hashing.bucket(
            col("l_orderkey").cast("string"), "mw", 2)),
        "variant", col("l_quantity"))),

    // Two-proportion z-test (pooled variance) on order F-status
    // conversion between the same hash variants — integer counts, so
    // the z arithmetic is exact scalar math.
    "q_ab_proportions" -> ((s, dir) =>
      Experiment.proportionsZTest(Tables.orders(s, dir)
          .withColumn("variant", graft.core.Hashing.bucket(
            col("o_custkey").cast("string"), "ab", 2)),
        "variant", col("o_orderstatus") === "F")),

    // Weight-of-Evidence / Information Value table (preprocessing/
    // WoeEncoder.scala): per-category smoothed class-conditional
    // shares — one conditional groupBy + a broadcast 1-row total.
    "q_woe_encoder" -> ((s, dir) =>
      graft.preprocessing.WoeEncoder.fit(Tables.orders(s, dir),
          "o_orderpriority", expr("o_orderstatus = 'F'"))
        .orderBy("category")),

    // Fairness slice table (metrics/Fairness.scala): confusion rates
    // per group in ONE grouped aggregate; nulls where a cell is empty.
    "q_fairness_slices" -> ((s, dir) =>
      Fairness.sliceReport(Tables.lineitem(s, dir), "l_returnflag",
          col("l_quantity") > 35, col("l_extendedprice") > 30000)
        .orderBy("group")),

    // The headline gaps off the same slice table: disparate-impact
    // ratio + equalized-odds TPR/FPR gaps, one ≤|groups|-row aggregate.
    "q_fairness_disparity" -> ((s, dir) =>
      Fairness.disparity(
        Fairness.sliceReport(Tables.lineitem(s, dir), "l_returnflag",
          col("l_quantity") > 35, col("l_extendedprice") > 30000))),

    // Kaplan–Meier retention curve over the event log (metrics/
    // Survival.scala): per-user durations in HOURS with 12-hour-gap
    // censoring (the corpus is a ~30-day high-frequency log), one
    // per-duration rollup, risk set + ordered survival product
    // strictly over that tiny frame.
    "q_kaplan_meier" -> ((s, dir) => {
      val dur = Survival.durations(Tables.events(s, dir), "user_id",
        "ts", churnGapUnits = 12, unitMicros = 3600000000L)
      Survival.kaplanMeier(dur, "duration", "churned")
        .orderBy("t")
    }),

    // Two-sample log-rank test (metrics/Survival.logRank): the same
    // per-user durations split into two md5-hash cohorts — observed vs
    // hypergeometric-expected deaths summed over the ≤|durations|
    // frame; χ² from the unrounded sums. The A/B readout for survival
    // (does onboarding variant 1 retain longer?).
    "q_logrank" -> ((s, dir) => {
      val dur = Survival.durations(Tables.events(s, dir), "user_id",
        "ts", churnGapUnits = 12, unitMicros = 3600000000L)
      Survival.logRank(dur.withColumn("cohort",
          graft.core.Hashing.bucket(col("unit").cast("string"), "lr", 2)
            .cast("string")),
        "duration", "churned", "cohort")
    }),

    // Delta-method ratio-metric A/B (Experiment.ratioMetricDelta, Deng
    // et al. KDD'18): value-per-event as the ratio of per-USER totals,
    // variance from the unit-level joint moments — the readout that is
    // wrong as a per-event t-test. One per-user rollup + ONE 12-column
    // conditional-moment aggregate. EXACT oracle.
    "q_ab_ratio_delta" -> ((s, dir) => {
      val per = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(sum(col("value")).as("y"), count(lit(1)).as("n"))
        .withColumn("variant", graft.core.Hashing.bucket(
          col("user_id").cast("string"), "rd", 2))
      Experiment.ratioMetricDelta(per, "variant", "y", "n")
    }),

    // Offline policy evaluation (metrics/PolicyEval.scala — Li et al.
    // WSDM'11 IPS replay, Swaminathan–Joachims SNIPS, Dudík et al.
    // ICML'11 doubly-robust): events as logged bandit rounds
    // (segment = user_id mod 10, action = event_type, reward = value,
    // logging propensity = the corpus action share), target policy =
    // per-segment greedy argmax of the round-6 reward model. All four
    // estimators in ONE corpus aggregate against two broadcast tiny
    // frames. EXACT oracle.
    "q_policy_eval" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(
        pmod(col("user_id"), lit(10L)).as("seg"),
        col("event_type").as("act"),
        col("value").cast("double").as("r"))
      val counts = ev.groupBy(col("act")).agg(count(lit(1)).as("__c"))
      val total = counts.agg(sum("__c").as("__t"))
      val share = counts.crossJoin(broadcast(total))
        .select(col("act"),
          round(col("__c").cast("double") / col("__t"), 6).as("p"))
      PolicyEval.evaluateGreedy(ev.join(broadcast(share), "act"),
        "seg", "act", "r", "p", clip = 0.01)
    }),

    // Cox proportional-hazards one-step estimator (Survival.coxOneStep):
    // the same per-user durations with ACTIVITY (event count) as the
    // covariate — "does activity level shift the churn hazard?", an
    // effect size (log hazard ratio) beside the log-rank test. One
    // rollup to per-duration moments, reverse-cumulative risk sets over
    // the tiny frame, U/I from unrounded sums. EXACT oracle.
    "q_cox_onestep" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val dur = Survival.durations(ev, "user_id", "ts",
        churnGapUnits = 12, unitMicros = 3600000000L)
      val activity = ev.groupBy(col("user_id").as("unit"))
        .agg(count(lit(1)).cast("double").as("x"))
      Survival.coxOneStep(dur.join(activity, "unit"),
        "duration", "churned", "x")
    }),

    // IPW average treatment effect (metrics/Experiment.ipwAte): the
    // observational complement to the randomized A/B gates —
    // Horvitz–Thompson + Hájek estimates with clipped inverse weights
    // and the overlap diagnostics, ONE corpus aggregate. Propensity
    // here is a fixed literal logistic surface (the trained-model
    // gate convention); treatment is the md5 bucket.
    "q_ipw_ate" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val e = lit(1.0) / (lit(1.0)
        + exp(-(lit(-0.2) + col("o_totalprice") * lit(0.00002))))
      Experiment.ipwAte(
        o.withColumn("__treat",
            graft.core.Hashing.bucket(col("o_orderkey").cast("string"),
              "ipw", 2) === 1)
          .withColumn("__e", e),
        "o_totalprice", "__treat", "__e", clip = 0.05)
    }),

    // Doubly-robust AIPW ATE (Experiment.aipwAte) on a CONFOUNDED
    // deterministic design: the propensity rises with order month
    // (e(x) = σ(−1 + 0.15·x)) and assignment draws a hash uniform
    // against it, so treated orders skew late-year and the naive
    // difference is biased — the setting AIPW exists for. Per-arm OLS
    // outcome models + residual IPW corrections, the WHOLE estimator
    // one 18-column aggregate. EXACT oracle: same moments, same
    // round-6 coefficient handoffs, same component assembly.
    "q_aipw_ate" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val x = month(col("o_orderdate")).cast("double")
      val e = lit(1.0) / (lit(1.0) + exp(-(lit(-1.0) + x * lit(0.15))))
      val u = pmod(graft.core.Hashing.h60(
          col("o_orderkey").cast("string"), "aipw"), lit(1000000L))
        .cast("double") / lit(1000000.0)
      Experiment.aipwAte(
        o.withColumn("__x", x).withColumn("__e", e)
          .withColumn("__treat", u < e),
        "o_totalprice", "__treat", "__e", "__x", clip = 0.05)
    }),

    // Cumulative gains / lift by score decile (metrics/Gains.scala):
    // exact decile boundaries from ONE aggregate, scan-fused binning
    // against the broadcast boundary array (never a corpus ntile),
    // cumulative windows over the 10-row frame.
    "q_gains_chart" -> ((s, dir) =>
      Gains.gainsChart(Tables.orders(s, dir)
          .withColumn("hot", col("o_orderstatus") === "F"),
        "o_totalprice", "hot")
        .orderBy("decile")),

    // Uplift-by-decile targeting table (metrics/Uplift.scala): same
    // exact-boundary scan-fused binning as the gains chart, but per
    // decile the treated/control conversion cells and their difference
    // — the incrementality readout.
    "q_uplift_deciles" -> ((s, dir) =>
      Uplift.upliftByDecile(Tables.orders(s, dir), "o_totalprice",
        graft.core.Hashing.bucket(
          col("o_custkey").cast("string"), "ab", 2) === 1,
        col("o_orderstatus") === "F")
        .orderBy("decile")),

    // k-anonymity / l-diversity release audit (quality/Anonymity.scala):
    // QI = (nation, market segment), sensitive = account balance,
    // k = 10 — one QI groupBy + a 1-row rollup.
    "q_k_anonymity" -> ((s, dir) =>
      graft.quality.Anonymity.kAnonymityReport(Tables.customer(s, dir),
        Seq("c_nationkey", "c_mktsegment"), "c_acctbal", k = 10)),

    "q_metrics_regression" -> ((s, dir) => {
      val df = Tables.lineitem(s, dir)
        .withColumn("y", col("l_extendedprice"))
        .withColumn("p", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      rounded(s, Seq(
        "mse" -> Metrics.meanSquaredError(df, "y", "p"),
        "rmse" -> Metrics.meanSquaredError(df, "y", "p", squared = false),
        "mae" -> Metrics.meanAbsoluteError(df, "y", "p"),
        "mape" -> Metrics.meanAbsolutePercentageError(df, "y", "p"),
        "r2" -> Metrics.r2Score(df, "y", "p"),
        "msle" -> Metrics.meanSquaredLogError(df, "y", "p"),
        "mae_weighted" -> Metrics.meanAbsoluteError(df, "y", "p", Some("l_quantity"))))
    }),

    // multioutput surface (tests/metrics/test_regression.py): raw
    // per-output values + uniform average in one aggregate pass; r2
    // only as uniform_average (reference raises on raw_values).
    "q_metrics_multioutput" -> ((s, dir) => {
      val df = Tables.lineitem(s, dir)
        .withColumn("y0", col("l_quantity"))
        .withColumn("p0", col("l_quantity") * 0.9 + 1.0)
        .withColumn("y1", col("l_extendedprice"))
        .withColumn("p1", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      val yT = Seq("y0", "y1"); val yP = Seq("p0", "p1")
      def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      import s.implicits._
      val rows = Seq("mae", "mape", "mse").map { m =>
        val raw = Metrics.regressionMulti(df, m, yT, yP, "raw_values")
        // uniform_average is derived from the same aggregate row —
        // identical arithmetic to the engine's own averaging path
        (m, r6(raw(0)), r6(raw(1)), r6(raw.sum / raw.length))
      } :+ {
        val r2 = Metrics.r2ScoreMulti(df, yT, yP)
        ("r2_avg", r6(r2), r6(r2), r6(r2))
      }
      rows.toDF("metric", "out_0", "out_1", "uniform_avg").orderBy("metric")
    }),

    "q_metrics_classification" -> ((s, dir) => {
      val df = Tables.lineitem(s, dir)
        .withColumn("pred", when(col("l_quantity") > 25, "R").otherwise("A"))
        .withColumn("is_r", (col("l_returnflag") === "R").cast("double"))
        .withColumn("prob", least(greatest(col("l_discount") * 10, lit(1e-15)),
          lit(1.0 - 1e-15)))
      rounded(s, Seq(
        "accuracy" -> Metrics.accuracyScore(df, "l_returnflag", "pred"),
        "accuracy_weighted" -> Metrics.accuracyScore(df, "l_returnflag", "pred",
          Some("l_quantity")),
        "hits" -> Metrics.accuracyScore(df, "l_returnflag", "pred", normalize = false),
        "log_loss" -> Metrics.logLoss(df, "is_r", "prob")))
    }),

    // Multiclass log loss: 3-class scores from deterministic formulas
    // (NOT summing to 1, so the renormalization path is exercised);
    // label = returnflag code.
    "q_log_loss_multi" -> ((s, dir) => {
      val df = Tables.lineitem(s, dir)
        .withColumn("y", when(col("l_returnflag") === "A", 0)
          .when(col("l_returnflag") === "N", 1).otherwise(2))
        .withColumn("probs", array(
          lit(0.2) + col("l_discount"),
          lit(0.5),
          lit(0.01) * col("l_quantity")))
      rounded(s, Seq(
        "log_loss_multi" -> Metrics.logLossMulti(df, "y", "probs"),
        "log_loss_multi_weighted" -> Metrics.logLossMulti(df, "y", "probs",
          Some("l_quantity"))))
    }),

    // SCORERS registry: get_scorer-driven evaluation of fixed
    // deterministic predictions (scorer.py:8-77 name->fn mapping).
    "q_scorers" -> ((s, dir) => {
      val df = Tables.lineitem(s, dir)
        .withColumn("y", col("l_extendedprice"))
        .withColumn("p", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .withColumn("ycls", (col("l_quantity") > 25).cast("double"))
        .withColumn("pcls", (col("l_discount") > 0.05).cast("double"))
      rounded(s, Seq(
        "r2" -> Scorer.getScorer("r2")(df, "y", "p"),
        "neg_mean_squared_error" ->
          Scorer.getScorer("neg_mean_squared_error")(df, "y", "p"),
        "accuracy" -> Scorer.getScorer("accuracy")(df, "ycls", "pcls")))
    }),

    // Confusion matrix: long-form (label, pred, n) — one hash
    // aggregate over ≤ |classes|² keys; pred is a deterministic 3-way
    // formula so the oracle reproduces it.
    "q_confusion" -> ((s, dir) =>
      Metrics.confusionMatrix(
        Tables.lineitem(s, dir).withColumn("p3",
          when(col("l_quantity") > 35, "R")
            .when(col("l_quantity") > 15, "N").otherwise("A")),
        "l_returnflag", "p3")
        .orderBy("label", "pred")),

    // Per-class precision/recall/F1 from the confusion marginals
    // (full-outer on the class key: classes never predicted — or never
    // true — keep their rows under the sklearn zero-division=0 rule).
    "q_prf1" -> ((s, dir) =>
      Metrics.precisionRecallF1(
        Tables.lineitem(s, dir).withColumn("p3",
          when(col("l_quantity") > 35, "R")
            .when(col("l_quantity") > 15, "N").otherwise("A")),
        "l_returnflag", "p3")
        .orderBy("clazz")),

    // Binary ROC-AUC via the tie-aware Mann–Whitney rank form — the
    // rank window runs over the per-score AGGREGATE, never the corpus.
    // l_discount has only 11 distinct values: the tie path carries the
    // whole statistic; l_extendedprice exercises the near-unique path.
    "q_roc_auc" -> ((s, dir) => {
      val df = Tables.lineitem(s, dir)
        .withColumn("is_r", (col("l_returnflag") === "R").cast("double"))
      rounded(s, Seq(
        "auc_ties" -> Metrics.rocAuc(df, "is_r", "l_discount"),
        "auc_dense" -> Metrics.rocAuc(df, "is_r", "l_extendedprice")))
    }),

    // PR-AUC (sklearn average_precision step form) over the same
    // per-score-aggregate shape as q_roc_auc — ties and near-unique.
    "q_pr_auc" -> ((s, dir) => {
      val df = Tables.lineitem(s, dir)
        .withColumn("is_r", (col("l_returnflag") === "R").cast("double"))
      rounded(s, Seq(
        "ap_ties" -> Metrics.averagePrecision(df, "is_r", "l_discount"),
        "ap_dense" -> Metrics.averagePrecision(df, "is_r", "l_extendedprice")))
    }),

    // MCC (Gorodkin R_K) + Cohen's kappa from one confusion aggregate —
    // multiclass over the q_confusion 3-way pred, binary over a
    // discount threshold; all four scalars are closed forms over the
    // same ≤|classes|² marginal frame the oracle rebuilds in SQL.
    "q_mcc_kappa" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("p3",
          when(col("l_quantity") > 35, "R")
            .when(col("l_quantity") > 15, "N").otherwise("A"))
        .withColumn("yb", (col("l_returnflag") === "R").cast("int").cast("string"))
        .withColumn("pb", (col("l_discount") > 0.05).cast("int").cast("string"))
      val (mccM, kapM) = Metrics.agreementStats(li, "l_returnflag", "p3")
      val (mccB, kapB) = Metrics.agreementStats(li, "yb", "pb")
      rounded(s, Seq(
        "mcc_multi" -> mccM, "kappa_multi" -> kapM,
        "mcc_binary" -> mccB, "kappa_binary" -> kapB))
    }),

    // NDCG@5 for embedding retrieval: cosine top-5 per query (the
    // q_ann_topk candidate set), relevance = label match, ideal
    // permutation via one per-query window over k rows.
    "q_ndcg" -> ((s, dir) => {
      val emb = graft.core.Tables.embeddings(s, dir)
      val cands = graft.llmdata.Ann.cosineTopK(emb,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
      val lbl = emb.select(col("vec_id"), col("label"))
      val rel = cands
        .join(broadcast(lbl.select(col("vec_id").as("query_id"),
          col("label").as("__lq"))), Seq("query_id"))
        .join(lbl.select(col("vec_id").as("neighbor_id"),
          col("label").as("__ln")), Seq("neighbor_id"))
        .withColumn("rel", (col("__lq") === col("__ln")).cast("int"))
      Metrics.ndcgPerQuery(rel, "query_id", "rank", "rel")
        .orderBy("query_id")
    }),

    // Retrieval report (MRR / P@5 / R@5) over the same cosine top-5
    // candidates as q_ndcg; recall's denominator = same-label corpus
    // vectors excluding the query itself.
    "q_retrieval_report" -> ((s, dir) => {
      val emb = graft.core.Tables.embeddings(s, dir)
      val cands = graft.llmdata.Ann.cosineTopK(emb,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
      val lbl = emb.select(col("vec_id"), col("label"))
      val perLabel = emb.groupBy(col("label")).agg(count(lit(1)).as("__n"))
      val rel = cands
        .join(broadcast(lbl.select(col("vec_id").as("query_id"),
          col("label").as("__lq"))), Seq("query_id"))
        .join(lbl.select(col("vec_id").as("neighbor_id"),
          col("label").as("__ln")), Seq("neighbor_id"))
        .withColumn("rel", (col("__lq") === col("__ln")).cast("int"))
        .join(broadcast(perLabel.select(col("label").as("__lq"),
          (col("__n") - 1).as("total_rel"))), Seq("__lq"))
      Metrics.retrievalReport(rel, "query_id", "rank", "rel",
        "total_rel", k = 5)
        .orderBy("query_id")
    }),

    // Expected/maximum calibration error off the same ROUNDED
    // reliability bins as q_calibration — the one-row model-card
    // scalar (ece = Σ n_b/N · |acc_b − conf_b|, mce = max gap).
    "q_ece" -> ((s, dir) => {
      val bins = Metrics.calibrationBins(
        Tables.lineitem(s, dir)
          .withColumn("is_r", (col("l_returnflag") === "R").cast("double"))
          .withColumn("p", col("l_discount") * 10),
        "is_r", "p", nBins = 10)
      bins.agg(
        round(sum(col("n") * col("gap")) / sum(col("n")), 6).as("ece"),
        max(col("gap")).as("mce"), sum(col("n")).as("n"))
    }),

    // Temperature-scaling calibration scan (Metrics.temperatureScan):
    // binary NLL at margin/T for a 5-point grid in ONE corpus pass
    // (softplus identities — no probability near 0/1), argmin flagged
    // via a broadcast min-struct. Margin is the fixed literal logistic
    // surface (trained-model gate convention).
    "q_temp_scaling" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("y", (col("l_returnflag") === "R").cast("double"))
        .withColumn("m", lit(-2.0) + col("l_quantity") * lit(0.1)
          - col("l_discount") * lit(5.0))
      Metrics.temperatureScan(li, "y", "m",
          Seq(0.25, 0.5, 1.0, 2.0, 4.0))
        .orderBy("t")
    }),

    // Wald SPRT daily monitor (Experiment.sprtBinomial): cumulative
    // binomial log-likelihood ratio of p1=0.21 vs p0=0.19 over the
    // event log's daily purchase rate, Wald boundaries at
    // alpha=0.05/beta=0.2 — the always-valid sequential decision per
    // day, windows strictly over the ≤|days| frame.
    "q_sprt" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(to_date(col("ts")).as("day"), lit(1L).as("trial"),
          (col("event_type") === "purchase").cast("long").as("succ"))
      Experiment.sprtBinomial(e, "day", "trial", "succ",
          p0 = 0.19, p1 = 0.21)
        .orderBy("day")
    }),

    // Calibration reliability bins: one ≤ nBins-key hash aggregate;
    // p = 10·l_discount spans [0,1] with mass at both edge bins.
    "q_calibration" -> ((s, dir) =>
      Metrics.calibrationBins(
        Tables.lineitem(s, dir)
          .withColumn("is_r", (col("l_returnflag") === "R").cast("double"))
          .withColumn("p", col("l_discount") * 10),
        "is_r", "p", nBins = 10)
        .orderBy("bin")),

    // Multinomial NB over hashed bag-of-words (naivebayes/
    // MultinomialNB.scala): fit on the 75% h60 train split of
    // documents, language prediction on the holdout — the full
    // train→HashedLinearScore→struct-argmax path replayed in SQL.
    "q_mnb_predict" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val b = graft.core.Hashing.bucket(col("doc_id"), "mnbsplit", 4)
      val model = new graft.naivebayes.MultinomialNB("text", "lang")
        .fit(docs.where(b < 3))
      model.predict(docs.where(b === 3), "text")
        .select(col("doc_id"), col("lang"), col("pred"),
          (col("lang") === col("pred")).as("correct"))
        .orderBy("doc_id")
    }),

    "q_gnb_fit" -> ((s, dir) => {
      val m = new GaussianNB(Seq("l_quantity", "l_extendedprice"), "l_returnflag")
        .fit(Tables.lineitem(s, dir))
      import s.implicits._
      def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      m.classes.indices.map { i =>
        (m.classes(i), r6(m.classPrior(i)), r6(m.theta(i)(0)), r6(m.theta(i)(1)),
          r6(m.sigma(i)(0)), r6(m.sigma(i)(1)))
      }.toDF("cls", "prior", "mean_qty", "mean_price", "var_qty", "var_price")
        .orderBy("cls")
    }),

    "q_gnb_predict" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val m = new GaussianNB(Seq("l_quantity", "l_extendedprice"), "l_returnflag").fit(li)
      m.transform(li)
        .select(col("l_orderkey"), col("l_linenumber"), col("prediction"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // predict_proba: softmax over the per-class joint log likelihoods —
    // the full fit+proba path, reproduced in SQL from the same grouped
    // statistics.
    "q_gnb_proba" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val m = new GaussianNB(Seq("l_quantity", "l_extendedprice"), "l_returnflag").fit(li)
      m.predictProba(li)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("proba_A"), 6).as("proba_a"),
          round(col("proba_N"), 6).as("proba_n"),
          round(col("proba_R"), 6).as("proba_r"))
        .orderBy("l_orderkey", "l_linenumber")
    })
  )

  private val fairnessSliceSql: String =
    """SELECT CAST(l_returnflag AS VARCHAR) AS grp,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN l_quantity > 35 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS pos,
      |    CAST(sum(CASE WHEN l_extendedprice > 30000 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS sel,
      |    CAST(sum(CASE WHEN (l_quantity > 35)
      |      = (l_extendedprice > 30000) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ok,
      |    CAST(sum(CASE WHEN l_quantity > 35 AND l_extendedprice > 30000
      |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |    CAST(sum(CASE WHEN NOT l_quantity > 35
      |      AND l_extendedprice > 30000 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS fp,
      |    CAST(sum(CASE WHEN NOT l_quantity > 35 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS neg
      |  FROM lineitem GROUP BY 1""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_mnb_predict" ->
      """WITH tr AS (SELECT text, lang FROM documents
        |  WHERE ('0x' || substr(md5('mnbsplit' || CAST(doc_id AS VARCHAR)),
        |    1, 15))::BIGINT % 4 < 3),
        |te AS (SELECT doc_id, text, lang FROM documents
        |  WHERE ('0x' || substr(md5('mnbsplit' || CAST(doc_id AS VARCHAR)),
        |    1, 15))::BIGINT % 4 = 3),
        |tb AS (SELECT lang AS c,
        |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 2048 AS b,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |    FROM tr) GROUP BY 1, 2),
        |ct AS (SELECT c, CAST(sum(n) AS BIGINT) AS tot FROM tb GROUP BY 1),
        |pri AS (SELECT lang AS c, CAST(count(*) AS BIGINT) AS dn
        |  FROM tr GROUP BY 1),
        |pt AS (SELECT CAST(sum(dn) AS BIGINT) AS dt FROM pri),
        |xtok AS (SELECT doc_id,
        |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 2048 AS b
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM te)),
        |sc AS (SELECT x.doc_id, ct.c,
        |    sum(ln((coalesce(tb.n, 0) + 1.0) / (ct.tot + 2048.0))) AS sw
        |  FROM xtok x CROSS JOIN ct
        |  LEFT JOIN tb ON tb.c = ct.c AND tb.b = x.b
        |  GROUP BY 1, 2),
        |ts2 AS (SELECT sc.doc_id, sc.c,
        |    round(sc.sw + ln(CAST(pri.dn AS DOUBLE) / pt.dt), 6) AS s
        |  FROM sc JOIN pri ON pri.c = sc.c CROSS JOIN pt),
        |pk AS (SELECT doc_id, c FROM (SELECT doc_id, c, s,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY s DESC, c DESC) AS rk FROM ts2) WHERE rk = 1)
        |SELECT te.doc_id, te.lang, pk.c AS pred,
        |  te.lang = pk.c AS correct
        |FROM te JOIN pk USING (doc_id) ORDER BY te.doc_id""".stripMargin,
    "q_diff_in_diff" ->
      """WITH b AS (SELECT
        |    (('0x' || substr(md5('ab' || CAST(o_custkey AS VARCHAR)),
        |      1, 15))::BIGINT % 2) = 1 AS t,
        |    o_orderdate >= TIMESTAMP '1995-01-01' AS p,
        |    o_totalprice AS y FROM orders),
        |c AS (SELECT t, p, CAST(count(*) AS BIGINT) AS n,
        |    round(avg(y), 6) AS m, round(var_samp(y), 6) AS s2
        |  FROM b GROUP BY 1, 2),
        |o AS (SELECT
        |    max(CASE WHEN NOT t AND NOT p THEN n END) AS n_cpre,
        |    max(CASE WHEN NOT t AND NOT p THEN m END) AS mean_cpre,
        |    max(CASE WHEN NOT t AND p THEN n END) AS n_cpost,
        |    max(CASE WHEN NOT t AND p THEN m END) AS mean_cpost,
        |    max(CASE WHEN t AND NOT p THEN n END) AS n_tpre,
        |    max(CASE WHEN t AND NOT p THEN m END) AS mean_tpre,
        |    max(CASE WHEN t AND p THEN n END) AS n_tpost,
        |    max(CASE WHEN t AND p THEN m END) AS mean_tpost,
        |    max(CASE WHEN NOT t AND NOT p THEN s2 END) AS v_cpre,
        |    max(CASE WHEN NOT t AND p THEN s2 END) AS v_cpost,
        |    max(CASE WHEN t AND NOT p THEN s2 END) AS v_tpre,
        |    max(CASE WHEN t AND p THEN s2 END) AS v_tpost
        |  FROM c)
        |SELECT n_cpre, mean_cpre, n_cpost, mean_cpost, n_tpre,
        |  mean_tpre, n_tpost, mean_tpost,
        |  round((mean_tpost - mean_tpre) - (mean_cpost - mean_cpre), 6)
        |    AS did,
        |  round(sqrt(v_tpost / n_tpost + v_tpre / n_tpre
        |    + v_cpost / n_cpost + v_cpre / n_cpre), 6) AS se,
        |  CASE WHEN sqrt(v_tpost / n_tpost + v_tpre / n_tpre
        |      + v_cpost / n_cpost + v_cpre / n_cpre) = 0
        |    OR sqrt(v_tpost / n_tpost + v_tpre / n_tpre
        |      + v_cpost / n_cpost + v_cpre / n_cpre) IS NULL THEN NULL
        |  ELSE round(((mean_tpost - mean_tpre) - (mean_cpost - mean_cpre))
        |    / sqrt(v_tpost / n_tpost + v_tpre / n_tpre
        |      + v_cpost / n_cpost + v_cpre / n_cpre), 6) END AS t
        |FROM o""".stripMargin,
    "q_ab_mannwhitney" ->
      """WITH b AS (SELECT
        |    CAST((('0x' || substr(md5('mw' || CAST(l_orderkey AS VARCHAR)),
        |      1, 15))::BIGINT % 2) AS VARCHAR) AS v,
        |    CAST(l_quantity AS BIGINT) AS q FROM lineitem),
        |pv AS (SELECT q,
        |    CAST(sum(CASE WHEN v = '0' THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(sum(CASE WHEN v = '1' THEN 1 ELSE 0 END) AS BIGINT) AS nb
        |  FROM b GROUP BY q),
        |sc AS (SELECT na, nb,
        |    coalesce(CAST(sum(na) OVER (ORDER BY q
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS cuma
        |  FROM pv),
        |ag AS (SELECT CAST(sum(na) AS BIGINT) AS n_a,
        |    CAST(sum(nb) AS BIGINT) AS n_b,
        |    sum(CAST(nb AS DOUBLE) * cuma
        |      + CAST(nb AS DOUBLE) * na / 2.0) AS u,
        |    sum(CAST(na + nb AS DOUBLE) * (na + nb) * (na + nb)
        |      - (na + nb)) AS ties
        |  FROM sc)
        |SELECT '0' AS variant_a, '1' AS variant_b, n_a, n_b,
        |  round(u, 6) AS u_b,
        |  round(CAST(n_a AS DOUBLE) * n_b / 2.0, 6) AS mu_u,
        |  round(sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0
        |    * ((n_a + n_b + 1)
        |      - ties / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1)))), 6)
        |    AS sigma_u,
        |  CASE WHEN sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0
        |      * ((n_a + n_b + 1)
        |        - ties / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1)))) = 0
        |    OR sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0
        |      * ((n_a + n_b + 1)
        |        - ties / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1))))
        |      IS NULL THEN NULL
        |  ELSE round((u - CAST(n_a AS DOUBLE) * n_b / 2.0)
        |    / sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0
        |      * ((n_a + n_b + 1)
        |        - ties / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1)))),
        |    6) END AS z
        |FROM ag""".stripMargin,
    "q_ab_srm" ->
      """WITH b AS (SELECT
        |    CAST((('0x' || substr(md5('ab' || CAST(o_custkey AS VARCHAR)),
        |      1, 15))::BIGINT % 2) AS VARCHAR) AS variant FROM orders),
        |p AS (SELECT variant, CAST(count(*) AS BIGINT) AS n
        |  FROM b GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM p)
        |SELECT variant, n, round(0.5 * nt, 6) AS expected_n,
        |  round(power(n - 0.5 * nt, 2) / (0.5 * nt), 6) AS chi2_term
        |FROM p CROSS JOIN t ORDER BY variant""".stripMargin,
    "q_ab_proportions" ->
      """WITH b AS (SELECT
        |    CAST((('0x' || substr(md5('ab' || CAST(o_custkey AS VARCHAR)),
        |      1, 15))::BIGINT % 2) AS VARCHAR) AS v,
        |    o_orderstatus = 'F' AS s FROM orders),
        |p AS (SELECT v, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM b GROUP BY 1),
        |ab AS (SELECT min(v) AS va, max(v) AS vb FROM p)
        |SELECT pa.v AS variant_a, pb.v AS variant_b,
        |  pa.n AS n_a, pb.n AS n_b, pa.c AS conv_a, pb.c AS conv_b,
        |  round(CAST(pa.c AS DOUBLE) / pa.n, 6) AS rate_a,
        |  round(CAST(pb.c AS DOUBLE) / pb.n, 6) AS rate_b,
        |  round(CAST(pb.c AS DOUBLE) / pb.n
        |    - CAST(pa.c AS DOUBLE) / pa.n, 6) AS lift_abs,
        |  round((CAST(pb.c AS DOUBLE) / pb.n
        |      - CAST(pa.c AS DOUBLE) / pa.n)
        |    / (CAST(pa.c AS DOUBLE) / pa.n), 6) AS lift_rel,
        |  round((CAST(pb.c AS DOUBLE) / pb.n
        |      - CAST(pa.c AS DOUBLE) / pa.n)
        |    / sqrt((CAST(pa.c + pb.c AS DOUBLE) / (pa.n + pb.n))
        |      * (1.0 - CAST(pa.c + pb.c AS DOUBLE) / (pa.n + pb.n))
        |      * (1.0 / pa.n + 1.0 / pb.n)), 6) AS z
        |FROM p pa, p pb, ab WHERE pa.v = ab.va AND pb.v = ab.vb""".stripMargin,
    "q_isotonic_calibration" ->
      """WITH base AS (SELECT CAST(epoch_us(l_shipdate) AS DOUBLE) AS s,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem WHERE l_shipdate IS NOT NULL),
        |rg AS (SELECT min(s) AS lo, max(s) AS hi FROM base),
        |bk AS (SELECT CAST(least(19, CASE WHEN hi = lo THEN 0
        |    ELSE floor((s - lo) / (hi - lo) * 20) END) AS INT) AS bucket,
        |    y
        |  FROM base CROSS JOIN rg),
        |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS pos FROM bk GROUP BY 1),
        |p AS (SELECT a.bucket, CAST(sum(b.n) AS BIGINT) AS cn,
        |    CAST(sum(b.pos) AS BIGINT) AS cp
        |  FROM g a JOIN g b ON b.bucket <= a.bucket GROUP BY 1),
        |pairs AS (SELECT pa.bucket AS a, pb.bucket AS b,
        |    (pb.cp - pa.cp + ga.pos)
        |      / CAST(pb.cn - pa.cn + ga.n AS DOUBLE) AS avg_ab
        |  FROM p pa JOIN p pb ON pa.bucket <= pb.bucket
        |  JOIN g ga ON ga.bucket = pa.bucket),
        |im AS (SELECT i.bucket AS i, pr.a, min(pr.avg_ab) AS m
        |  FROM pairs pr JOIN g i
        |    ON pr.a <= i.bucket AND i.bucket <= pr.b
        |  GROUP BY 1, 2),
        |fit AS (SELECT i, max(m) AS f FROM im GROUP BY 1)
        |SELECT g.bucket, g.n, g.pos,
        |  round(CAST(g.pos AS DOUBLE) / g.n, 6) AS raw_rate,
        |  round(f, 6) AS fitted
        |FROM g JOIN fit ON fit.i = g.bucket ORDER BY g.bucket""".stripMargin,
    "q_woe_encoder" ->
      """WITH per AS (SELECT o_orderpriority AS category,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_pos,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
        |      AS BIGINT) AS n_neg
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(sum(n_pos) AS BIGINT) AS tp,
        |    CAST(sum(n_neg) AS BIGINT) AS tn,
        |    CAST(count(*) AS BIGINT) AS k FROM per)
        |SELECT category, n_pos, n_neg,
        |  round(ln(((n_pos + 0.5) / (tp + 0.5 * k))
        |    / ((n_neg + 0.5) / (tn + 0.5 * k))), 6) AS woe,
        |  round(((n_pos + 0.5) / (tp + 0.5 * k)
        |      - (n_neg + 0.5) / (tn + 0.5 * k))
        |    * round(ln(((n_pos + 0.5) / (tp + 0.5 * k))
        |      / ((n_neg + 0.5) / (tn + 0.5 * k))), 6), 6) AS iv_term
        |FROM per CROSS JOIN t ORDER BY category""".stripMargin,
    "q_fairness_slices" ->
      s"""WITH s AS ($fairnessSliceSql)
         |SELECT grp AS "group", n,
         |  round(CAST(pos AS DOUBLE) / n, 6) AS base_rate,
         |  round(CAST(sel AS DOUBLE) / n, 6) AS selection_rate,
         |  round(CAST(ok AS DOUBLE) / n, 6) AS accuracy,
         |  round(CAST(tp AS DOUBLE) / pos, 6) AS tpr,
         |  round(CAST(fp AS DOUBLE) / neg, 6) AS fpr,
         |  round(CAST(tp AS DOUBLE) / sel, 6) AS "precision"
         |FROM s ORDER BY grp""".stripMargin,
    "q_fairness_disparity" ->
      s"""WITH s AS ($fairnessSliceSql),
         |r AS (SELECT
         |    round(CAST(sel AS DOUBLE) / n, 6) AS selection_rate,
         |    round(CAST(tp AS DOUBLE) / pos, 6) AS tpr,
         |    round(CAST(fp AS DOUBLE) / neg, 6) AS fpr
         |  FROM s)
         |SELECT round(min(selection_rate) / max(selection_rate), 6)
         |    AS disparate_impact,
         |  round(max(tpr) - min(tpr), 6) AS tpr_gap,
         |  round(max(fpr) - min(fpr), 6) AS fpr_gap
         |FROM r""".stripMargin,
    "q_kaplan_meier" ->
      """WITH per AS (SELECT user_id,
        |    epoch_us(min(ts)) AS f, epoch_us(max(ts)) AS l
        |  FROM events GROUP BY user_id),
        |cut AS (SELECT max(l) AS c FROM per),
        |u AS (SELECT
        |    CAST(floor((l - f) / CAST(3600000000 AS DOUBLE)) AS BIGINT)
        |      AS t,
        |    l < c - 12 * 3600000000 AS e
        |  FROM per CROSS JOIN cut),
        |g AS (SELECT t, CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM u GROUP BY t),
        |r AS (SELECT t, m, d,
        |    sum(m) OVER (ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n,
        |    round(1 - CAST(d AS DOUBLE)
        |      / sum(m) OVER (ORDER BY t DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |      AS fct
        |  FROM g),
        |s AS (SELECT t, n, d, m,
        |    round(product(fct) OVER (ORDER BY t ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |      AS surv
        |  FROM r)
        |SELECT t, CAST(n AS BIGINT) AS n_risk, d AS n_events,
        |  m - d AS n_censored_at, surv
        |FROM s WHERE d > 0 ORDER BY t""".stripMargin,
    "q_logrank" ->
      """WITH per AS (SELECT user_id,
        |    epoch_us(min(ts)) AS f, epoch_us(max(ts)) AS l
        |  FROM events GROUP BY user_id),
        |cut AS (SELECT max(l) AS c FROM per),
        |u AS (SELECT
        |    CAST(floor((l - f) / CAST(3600000000 AS DOUBLE)) AS BIGINT)
        |      AS t,
        |    l < c - 12 * 3600000000 AS e,
        |    (('0x' || substr(md5('lr' || CAST(user_id AS VARCHAR)),
        |      1, 15))::BIGINT % 2) = 0 AS a
        |  FROM per CROSS JOIN cut),
        |g AS (SELECT t, CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ma,
        |    CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(sum(CASE WHEN e AND a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS da
        |  FROM u GROUP BY t),
        |r AS (SELECT t, m, ma, d, da,
        |    sum(m) OVER (ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n,
        |    sum(ma) OVER (ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS na
        |  FROM g),
        |agg AS (SELECT CAST(sum(da) AS BIGINT) AS oa,
        |    CAST(sum(d) AS BIGINT) AS dt,
        |    sum(CAST(d AS DOUBLE) * na / n) AS eat,
        |    sum(CASE WHEN n > 1 THEN CAST(d AS DOUBLE)
        |      * (CAST(na AS DOUBLE) / n)
        |      * (1 - CAST(na AS DOUBLE) / n)
        |      * (n - d) / (n - 1) ELSE 0 END) AS vt
        |  FROM r WHERE d > 0)
        |SELECT '0' AS group_a, oa AS o_a, round(eat, 6) AS e_a,
        |  dt - oa AS o_b, round(CAST(dt AS DOUBLE) - eat, 6) AS e_b,
        |  round(vt, 6) AS var_logrank,
        |  CASE WHEN vt > 0 THEN
        |    round((CAST(oa AS DOUBLE) - eat) * (CAST(oa AS DOUBLE) - eat)
        |      / vt, 6) END AS chi2
        |FROM agg""".stripMargin,
    "q_ab_ratio_delta" ->
      """WITH per AS (SELECT user_id, sum(value) AS y,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    ('0x' || substr(md5('rd' || CAST(user_id AS VARCHAR)),
        |      1, 15))::BIGINT % 2 AS v
        |  FROM events GROUP BY user_id),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    sum(CASE WHEN v = 0 THEN y ELSE 0 END) AS sya,
        |    sum(CASE WHEN v = 0 THEN n ELSE 0 END) AS sna,
        |    sum(CASE WHEN v = 0 THEN y * y ELSE 0 END) AS syya,
        |    sum(CASE WHEN v = 0 THEN n * n ELSE 0 END) AS snna,
        |    sum(CASE WHEN v = 0 THEN y * n ELSE 0 END) AS syna,
        |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb,
        |    sum(CASE WHEN v = 1 THEN y ELSE 0 END) AS syb,
        |    sum(CASE WHEN v = 1 THEN n ELSE 0 END) AS snb,
        |    sum(CASE WHEN v = 1 THEN y * y ELSE 0 END) AS syyb,
        |    sum(CASE WHEN v = 1 THEN n * n ELSE 0 END) AS snnb,
        |    sum(CASE WHEN v = 1 THEN y * n ELSE 0 END) AS synb
        |  FROM per),
        |st AS (SELECT ca, cb,
        |    sya / sna AS ra, syb / snb AS rb,
        |    sna / CAST(ca AS DOUBLE) AS nba, snb / CAST(cb AS DOUBLE)
        |      AS nbb,
        |    (syya - sya * sya / CAST(ca AS DOUBLE))
        |      / (CAST(ca AS DOUBLE) - 1.0) AS vya,
        |    (snna - sna * sna / CAST(ca AS DOUBLE))
        |      / (CAST(ca AS DOUBLE) - 1.0) AS vna,
        |    (syna - sya * sna / CAST(ca AS DOUBLE))
        |      / (CAST(ca AS DOUBLE) - 1.0) AS cyna,
        |    (syyb - syb * syb / CAST(cb AS DOUBLE))
        |      / (CAST(cb AS DOUBLE) - 1.0) AS vyb,
        |    (snnb - snb * snb / CAST(cb AS DOUBLE))
        |      / (CAST(cb AS DOUBLE) - 1.0) AS vnb,
        |    (synb - syb * snb / CAST(cb AS DOUBLE))
        |      / (CAST(cb AS DOUBLE) - 1.0) AS cynb
        |  FROM m),
        |vr AS (SELECT ca, cb, ra, rb,
        |    (vya - 2.0 * ra * cyna + ra * ra * vna) / (nba * nba)
        |      / CAST(ca AS DOUBLE) AS va,
        |    (vyb - 2.0 * rb * cynb + rb * rb * vnb) / (nbb * nbb)
        |      / CAST(cb AS DOUBLE) AS vb
        |  FROM st)
        |SELECT ca AS n_a, cb AS n_b, round(ra, 6) AS ratio_a,
        |  round(rb, 6) AS ratio_b, round(va, 6) AS var_a,
        |  round(vb, 6) AS var_b, round(rb - ra, 6) AS diff,
        |  round(sqrt(va + vb), 6) AS se,
        |  round((rb - ra) / sqrt(va + vb), 6) AS z
        |FROM vr""".stripMargin,
    "q_policy_eval" ->
      """WITH ev AS (SELECT user_id % 10 AS seg, event_type AS act,
        |    CAST(value AS DOUBLE) AS r FROM events),
        |cnt AS (SELECT act, CAST(count(*) AS BIGINT) AS c
        |  FROM ev GROUP BY 1),
        |tot AS (SELECT sum(c) AS t FROM cnt),
        |share AS (SELECT act, round(CAST(c AS DOUBLE) / t, 6) AS p
        |  FROM cnt CROSS JOIN tot),
        |lg AS (SELECT ev.seg, ev.act, ev.r, share.p
        |  FROM ev JOIN share USING (act)),
        |q AS (SELECT seg, act, round(avg(r), 6) AS q
        |  FROM lg GROUP BY 1, 2),
        |pi AS (SELECT seg, act AS pi_action FROM (SELECT seg, act,
        |    row_number() OVER (PARTITION BY seg ORDER BY q DESC, act)
        |      AS rk FROM q) WHERE rk = 1),
        |j AS (SELECT l.r, least(greatest(l.p, 0.01), 1.0) AS p,
        |    qa.q AS q_a,
        |    qp.q AS q_pi, (l.act = pi.pi_action) AS mt
        |  FROM lg l
        |  JOIN q qa ON qa.seg = l.seg AND qa.act = l.act
        |  JOIN pi ON pi.seg = l.seg
        |  JOIN q qp ON qp.seg = l.seg AND qp.act = pi.pi_action),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN mt THEN 1 ELSE 0 END) AS BIGINT) AS nm,
        |    sum(r) AS sr,
        |    sum(r * (CASE WHEN mt THEN 1.0 / p ELSE 0.0 END)) AS srw,
        |    sum(CASE WHEN mt THEN 1.0 / p ELSE 0.0 END) AS sw,
        |    sum(q_pi) AS sqpi,
        |    sum(q_pi + (r - q_a)
        |      * (CASE WHEN mt THEN 1.0 / p ELSE 0.0 END)) AS sdr
        |  FROM j)
        |SELECT n, nm AS n_match,
        |  round(CAST(nm AS DOUBLE) / n, 6) AS match_rate,
        |  round(sr / n, 6) AS v_logged,
        |  round(srw / n, 6) AS v_ips,
        |  round(srw / sw, 6) AS v_snips,
        |  round(sqpi / n, 6) AS v_dm,
        |  round(sdr / n, 6) AS v_dr
        |FROM m""".stripMargin,
    "q_cox_onestep" ->
      """WITH per AS (SELECT user_id,
        |    epoch_us(min(ts)) AS f, epoch_us(max(ts)) AS l,
        |    CAST(count(*) AS DOUBLE) AS x
        |  FROM events GROUP BY user_id),
        |cut AS (SELECT max(l) AS c FROM per),
        |u AS (SELECT
        |    CAST(floor((l - f) / CAST(3600000000 AS DOUBLE)) AS BIGINT)
        |      AS t,
        |    l < c - 12 * 3600000000 AS e, x
        |  FROM per CROSS JOIN cut),
        |g AS (SELECT t, CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    sum(x) AS sx, sum(x * x) AS sxx,
        |    sum(CASE WHEN e THEN x ELSE 0 END) AS sex
        |  FROM u GROUP BY t),
        |r AS (SELECT t, m, d, sx, sxx, sex,
        |    sum(m) OVER (ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s0,
        |    sum(sx) OVER (ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1,
        |    sum(sxx) OVER (ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s2
        |  FROM g),
        |agg AS (SELECT CAST(sum(d) AS BIGINT) AS dt,
        |    sum(sex - CAST(d AS DOUBLE) * (s1 / CAST(s0 AS DOUBLE)))
        |      AS ut,
        |    sum(CAST(d AS DOUBLE) * (s2 / CAST(s0 AS DOUBLE)
        |      - (s1 / CAST(s0 AS DOUBLE)) * (s1 / CAST(s0 AS DOUBLE))))
        |      AS it
        |  FROM r WHERE d > 0)
        |SELECT dt AS n_events, round(ut, 6) AS u_score,
        |  round(it, 6) AS information,
        |  CASE WHEN it > 0 THEN round(ut / it, 6) END AS beta_onestep,
        |  CASE WHEN it > 0 THEN round(ut * ut / it, 6) END
        |    AS score_chi2
        |FROM agg""".stripMargin,
    "q_temp_scaling" -> {
      // stable softplus on the oracle side too (max(-z,0)+ln(1+e^{-|z|}))
      // so both engines evaluate the identical overflow-safe expression
      val nllCte = Seq(0.25, 0.5, 1.0, 2.0, 4.0).map { t =>
        val sp = s"greatest(-(m / $t), CAST(0 AS DOUBLE))" +
          s" + ln(1 + exp(-abs(m / $t)))"
        s"""SELECT CAST('$t' AS DOUBLE) AS t,
           |  round(avg(CASE WHEN y > 0 THEN $sp
           |    ELSE (m / $t) + $sp END), 6) AS nll
           |FROM base""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""WITH base AS MATERIALIZED (SELECT
         |    CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y,
         |    ((-2.0) + (l_quantity * 0.1)) - (l_discount * 5.0) AS m
         |  FROM lineitem),
         |g AS MATERIALIZED (
         |  $nllCte),
         |b AS (SELECT t FROM g ORDER BY nll, t LIMIT 1)
         |SELECT g.t, g.nll, g.t = b.t AS is_best
         |FROM g, b ORDER BY g.t""".stripMargin
    },
    "q_sprt" -> {
      val (p0, p1, alpha, beta) = (0.19, 0.21, 0.05, 0.2)
      val c1 = math.log(p1 / p0)
      val c2 = math.log((1 - p1) / (1 - p0))
      val lo = math.log(beta / (1 - alpha))
      val hi = math.log((1 - beta) / alpha)
      s"""WITH per AS (SELECT CAST(ts AS DATE) AS day,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |c AS (SELECT day, n, x,
         |    x * CAST('$c1' AS DOUBLE) + (n - x) * CAST('$c2' AS DOUBLE)
         |      AS llr FROM per),
         |s AS (SELECT day, n, x, round(llr, 6) AS llr,
         |    round(sum(llr) OVER (ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
         |      AS cum_llr
         |  FROM c)
         |SELECT day, n, x, llr, cum_llr,
         |  CASE WHEN cum_llr >= CAST('$hi' AS DOUBLE) THEN 'accept_h1'
         |       WHEN cum_llr <= CAST('$lo' AS DOUBLE) THEN 'accept_h0'
         |       ELSE 'continue' END AS decision
         |FROM s ORDER BY day""".stripMargin
    },
    "q_ipw_ate" ->
      """WITH b AS (SELECT
        |    CAST(o_totalprice AS DOUBLE) AS y,
        |    (('0x' || substr(md5('ipw' || CAST(o_orderkey AS VARCHAR)),
        |      1, 15))::BIGINT % 2) = 1 AS t,
        |    least(greatest(
        |      1.0 / (1.0 + exp(-((-0.2)
        |        + (CAST(o_totalprice AS DOUBLE) * 0.00002)))),
        |      0.05), 0.95) AS e
        |  FROM orders),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |    CAST(count(*) AS BIGINT) AS n,
        |    sum(CASE WHEN t THEN y / e ELSE 0 END) AS syt,
        |    sum(CASE WHEN NOT t THEN y / (1.0 - e) ELSE 0 END) AS syc,
        |    sum(CASE WHEN t THEN 1.0 / e ELSE 0 END) AS swt,
        |    sum(CASE WHEN NOT t THEN 1.0 / (1.0 - e) ELSE 0 END) AS swc
        |  FROM b)
        |SELECT nt AS n_treated, nc AS n_control,
        |  round(swt / nt, 6) AS mean_w_treated,
        |  round(swc / nc, 6) AS mean_w_control,
        |  round(syt / n - syc / n, 6) AS ate_ht,
        |  round(syt / swt - syc / swc, 6) AS ate_hajek
        |FROM m""".stripMargin,
    "q_aipw_ate" ->
      """WITH b0 AS (SELECT
        |    CAST(o_totalprice AS DOUBLE) AS y,
        |    CAST(month(o_orderdate) AS DOUBLE) AS x,
        |    1.0 / (1.0 + exp(-((-1.0)
        |      + (CAST(month(o_orderdate) AS DOUBLE) * 0.15)))) AS e0,
        |    CAST(('0x' || substr(md5('aipw'
        |        || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
        |      % 1000000 AS DOUBLE) / 1000000.0 AS u
        |  FROM orders),
        |b AS (SELECT y, x, (u < e0) AS t,
        |    least(greatest(e0, 0.05), 0.95) AS e FROM b0),
        |m AS (SELECT
        |    CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
        |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    sum(CASE WHEN t THEN x ELSE 0 END) AS sxt,
        |    sum(CASE WHEN t THEN x * x ELSE 0 END) AS sxxt,
        |    sum(CASE WHEN t THEN y ELSE 0 END) AS syt,
        |    sum(CASE WHEN t THEN x * y ELSE 0 END) AS sxyt,
        |    sum(CASE WHEN t THEN 1.0 / e ELSE 0 END) AS swt,
        |    sum(CASE WHEN t THEN x / e ELSE 0 END) AS swxt,
        |    sum(CASE WHEN t THEN y / e ELSE 0 END) AS swyt,
        |    CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |    sum(CASE WHEN NOT t THEN x ELSE 0 END) AS sxc,
        |    sum(CASE WHEN NOT t THEN x * x ELSE 0 END) AS sxxc,
        |    sum(CASE WHEN NOT t THEN y ELSE 0 END) AS syc,
        |    sum(CASE WHEN NOT t THEN x * y ELSE 0 END) AS sxyc,
        |    sum(CASE WHEN NOT t THEN 1.0 / (1.0 - e) ELSE 0 END) AS swc,
        |    sum(CASE WHEN NOT t THEN x / (1.0 - e) ELSE 0 END) AS swxc,
        |    sum(CASE WHEN NOT t THEN y / (1.0 - e) ELSE 0 END) AS swyc
        |  FROM b),
        |f1 AS (SELECT *,
        |    round((CAST(nt AS DOUBLE) * sxyt - sxt * syt)
        |      / (CAST(nt AS DOUBLE) * sxxt - sxt * sxt), 6) AS b1,
        |    round((CAST(nc AS DOUBLE) * sxyc - sxc * syc)
        |      / (CAST(nc AS DOUBLE) * sxxc - sxc * sxc), 6) AS b0c
        |  FROM m),
        |f2 AS (SELECT *,
        |    round((syt - b1 * sxt) / CAST(nt AS DOUBLE), 6) AS a1,
        |    round((syc - b0c * sxc) / CAST(nc AS DOUBLE), 6) AS a0
        |  FROM f1),
        |cm AS (SELECT nt, nc, a1, b1, a0, b0c,
        |    round((a1 - a0) + (b1 - b0c) * (sx / n), 6)
        |      AS ate_outcome_model,
        |    round((swyt - a1 * swt - b1 * swxt) / n, 6)
        |      AS resid_corr_treated,
        |    round((swyc - a0 * swc - b0c * swxc) / n, 6)
        |      AS resid_corr_control
        |  FROM f2)
        |SELECT nt AS n_treated, nc AS n_control,
        |  a1 AS mu1_intercept, b1 AS mu1_slope,
        |  a0 AS mu0_intercept, b0c AS mu0_slope,
        |  ate_outcome_model, resid_corr_treated, resid_corr_control,
        |  round(ate_outcome_model + resid_corr_treated
        |    - resid_corr_control, 6) AS ate_aipw
        |FROM cm""".stripMargin,
    "q_uplift_deciles" ->
      """WITH b AS (SELECT o_totalprice AS s,
        |    (('0x' || substr(md5('ab' || CAST(o_custkey AS VARCHAR)),
        |      1, 15))::BIGINT % 2) = 1 AS t,
        |    o_orderstatus = 'F' AS y FROM orders),
        |q AS (SELECT [round(quantile_cont(s, 0.1), 6),
        |    round(quantile_cont(s, 0.2), 6), round(quantile_cont(s, 0.3), 6),
        |    round(quantile_cont(s, 0.4), 6), round(quantile_cont(s, 0.5), 6),
        |    round(quantile_cont(s, 0.6), 6), round(quantile_cont(s, 0.7), 6),
        |    round(quantile_cont(s, 0.8), 6), round(quantile_cont(s, 0.9), 6)]
        |    AS bs FROM b),
        |binned AS (SELECT t, y,
        |    1 + len(list_filter(bs, e -> s < e)) AS decile
        |  FROM b CROSS JOIN q),
        |per AS (SELECT decile,
        |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
        |    CAST(sum(CASE WHEN t AND y THEN 1 ELSE 0 END) AS BIGINT)
        |      AS conv_t,
        |    CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
        |    CAST(sum(CASE WHEN NOT t AND y THEN 1 ELSE 0 END) AS BIGINT)
        |      AS conv_c
        |  FROM binned GROUP BY 1)
        |SELECT CAST(decile AS INTEGER) AS decile, n_t, conv_t, n_c, conv_c,
        |  round(CAST(conv_t AS DOUBLE) / n_t, 6) AS rate_t,
        |  round(CAST(conv_c AS DOUBLE) / n_c, 6) AS rate_c,
        |  round(CAST(conv_t AS DOUBLE) / n_t
        |    - CAST(conv_c AS DOUBLE) / n_c, 6) AS uplift
        |FROM per ORDER BY decile""".stripMargin,
    "q_gains_chart" ->
      """WITH b AS (SELECT o_totalprice AS s,
        |    o_orderstatus = 'F' AS y FROM orders),
        |q AS (SELECT [round(quantile_cont(s, 0.1), 6),
        |    round(quantile_cont(s, 0.2), 6), round(quantile_cont(s, 0.3), 6),
        |    round(quantile_cont(s, 0.4), 6), round(quantile_cont(s, 0.5), 6),
        |    round(quantile_cont(s, 0.6), 6), round(quantile_cont(s, 0.7), 6),
        |    round(quantile_cont(s, 0.8), 6), round(quantile_cont(s, 0.9), 6)]
        |    AS bs FROM b),
        |binned AS (SELECT y,
        |    1 + len(list_filter(bs, e -> s < e)) AS decile
        |  FROM b CROSS JOIN q),
        |per AS (SELECT decile, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM binned GROUP BY decile),
        |c AS (SELECT decile, n, pos,
        |    sum(pos) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
        |    sum(n) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
        |    sum(pos) OVER () AS tp, sum(n) OVER () AS tn
        |  FROM per)
        |SELECT CAST(decile AS INTEGER) AS decile, n, pos,
        |  round(CAST(cp AS DOUBLE) / tp, 6) AS cum_gain,
        |  round((CAST(cp AS DOUBLE) / cn) / (CAST(tp AS DOUBLE) / tn), 6)
        |    AS lift
        |FROM c ORDER BY decile""".stripMargin,
    "q_ab_cuped" ->
      """WITH per AS (SELECT o_custkey,
        |    round(sum(CASE WHEN o_orderdate < TIMESTAMP '1995-01-01'
        |      THEN o_totalprice ELSE 0 END), 6) AS x,
        |    round(sum(CASE WHEN o_orderdate >= TIMESTAMP '1995-01-01'
        |      THEN o_totalprice ELSE 0 END), 6) AS y,
        |    ('0x' || substr(md5('ab' || CAST(o_custkey AS VARCHAR)),
        |      1, 15))::BIGINT % 2 AS v
        |  FROM orders GROUP BY o_custkey),
        |g AS (SELECT coalesce(round(regr_slope(y, x), 6), 0) AS th,
        |    round(avg(x), 6) AS mx FROM per),
        |pv AS (SELECT CAST(v AS VARCHAR) AS v, CAST(count(*) AS BIGINT) AS n,
        |    round(avg(y), 6) AS my, round(avg(x), 6) AS mxv,
        |    round(var_samp(y), 6) AS vy, round(var_samp(x), 6) AS vx,
        |    round(covar_samp(x, y), 6) AS cxy
        |  FROM per GROUP BY 1),
        |adj AS (SELECT v, n, my, round(my - th * (mxv - mx), 6) AS ma, vy,
        |    round(vy - 2 * th * cxy + th * th * vx, 6) AS va, th
        |  FROM pv CROSS JOIN g),
        |a AS (SELECT * FROM adj ORDER BY v LIMIT 1),
        |b AS (SELECT * FROM adj ORDER BY v DESC LIMIT 1)
        |SELECT a.v AS variant_a, b.v AS variant_b, a.n AS n_a, b.n AS n_b,
        |  a.my AS mean_a, b.my AS mean_b,
        |  round(b.my - a.my, 6) AS lift_raw,
        |  round(b.ma - a.ma, 6) AS lift_cuped, a.th AS theta,
        |  round(1 - ((a.n - 1) * a.va + (b.n - 1) * b.va)
        |    / ((a.n - 1) * a.vy + (b.n - 1) * b.vy), 6) AS var_reduction,
        |  round((b.my - a.my) / sqrt(a.vy / a.n + b.vy / b.n), 6) AS t_raw,
        |  round((b.ma - a.ma) / sqrt(a.va / a.n + b.va / b.n), 6) AS t_cuped,
        |  round(pow(a.va / a.n + b.va / b.n, 2)
        |    / (pow(a.va / a.n, 2) / (a.n - 1)
        |       + pow(b.va / b.n, 2) / (b.n - 1)), 6) AS df_cuped
        |FROM a CROSS JOIN b""".stripMargin,
    "q_k_anonymity" ->
      """WITH c AS (SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |    count(DISTINCT c_acctbal) AS l
        |  FROM customer GROUP BY 1, 2)
        |SELECT CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(min(n) AS BIGINT) AS k_min,
        |  CAST(sum(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating_k,
        |  CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT)
        |    AS rows_at_risk,
        |  round(CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS DOUBLE)
        |    / sum(n), 6) AS frac_at_risk,
        |  CAST(min(l) AS BIGINT) AS l_min,
        |  CAST(sum(CASE WHEN l < 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating_l
        |FROM c""".stripMargin,
    "q_conformal_interval" ->
      """WITH b AS (SELECT l_quantity AS x, l_extendedprice AS y,
        |    ('0x' || substr(md5('conf' || CAST(l_orderkey AS VARCHAR)
        |      || '-' || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT
        |      % 10 AS bk
        |  FROM lineitem),
        |tr AS (SELECT round(regr_slope(y, x), 6) AS m,
        |    round(regr_intercept(y, x), 6) AS c
        |  FROM b WHERE bk <= 7),
        |q AS (SELECT CAST(count(*) AS BIGINT) AS n_calib,
        |    round(quantile_cont(round(abs(y - (m * x + c)), 6), 0.9), 6)
        |      AS qhat
        |  FROM b, tr WHERE bk = 8)
        |SELECT q.n_calib, CAST(count(*) AS BIGINT) AS n_test, q.qhat,
        |  round(avg(CASE WHEN round(abs(y - (m * x + c)), 6) <= q.qhat
        |    THEN 1 ELSE 0 END), 6) AS coverage
        |FROM b, tr, q WHERE bk = 9
        |GROUP BY q.n_calib, q.qhat""".stripMargin,
    "q_confusion" ->
      """SELECT l_returnflag AS label,
        | CASE WHEN l_quantity > 35 THEN 'R'
        |      WHEN l_quantity > 15 THEN 'N' ELSE 'A' END AS pred,
        | count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY label, pred""".stripMargin,

    // marginal mirror of precisionRecallF1: tp from the diagonal,
    // fp/fn from per-pred/per-label counts, f1 from the ROUNDED
    // precision/recall exactly as the Spark expression computes it.
    "q_prf1" ->
      """WITH d AS (SELECT l_returnflag AS label,
        |  CASE WHEN l_quantity > 35 THEN 'R'
        |       WHEN l_quantity > 15 THEN 'N' ELSE 'A' END AS pred
        |  FROM lineitem),
        |lbl AS (SELECT label AS clazz, count(*) AS n_true FROM d GROUP BY 1),
        |prd AS (SELECT pred AS clazz, count(*) AS n_pred FROM d GROUP BY 1),
        |diag AS (SELECT label AS clazz, count(*) AS tp FROM d
        |         WHERE label = pred GROUP BY 1),
        |j AS (SELECT coalesce(l.clazz, p.clazz) AS clazz,
        |        coalesce(l.n_true, 0) AS n_true,
        |        coalesce(p.n_pred, 0) AS n_pred
        |      FROM lbl l FULL OUTER JOIN prd p ON l.clazz = p.clazz),
        |c AS (SELECT j.clazz, coalesce(diag.tp, 0) AS tp,
        |        j.n_pred - coalesce(diag.tp, 0) AS fp,
        |        j.n_true - coalesce(diag.tp, 0) AS fn
        |      FROM j LEFT JOIN diag ON j.clazz = diag.clazz),
        |pr AS (SELECT clazz, tp, fp, fn,
        |        round(CASE WHEN tp + fp = 0 THEN 0.0
        |          ELSE CAST(tp AS DOUBLE) / (tp + fp) END, 6) AS precision,
        |        round(CASE WHEN tp + fn = 0 THEN 0.0
        |          ELSE CAST(tp AS DOUBLE) / (tp + fn) END, 6) AS recall
        |       FROM c)
        |SELECT clazz, tp, fp, fn, precision, recall,
        | round(CASE WHEN precision + recall = 0 THEN 0.0
        |   ELSE 2.0 * precision * recall / (precision + recall) END, 6) AS f1
        |FROM pr ORDER BY clazz""".stripMargin,

    // tie-aware Mann–Whitney AUC over the per-score aggregate — the
    // same group/cumulate/sum arithmetic as Metrics.rocAuc.
    "q_roc_auc" ->
      """WITH d AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END
        |    AS is_r, l_discount AS s1, l_extendedprice AS s2 FROM lineitem),
        |g1 AS (SELECT s1, CAST(count(*) AS DOUBLE) AS cnt,
        |         sum(is_r) AS pos FROM d GROUP BY s1),
        |c1 AS (SELECT *, coalesce(sum(cnt) OVER (ORDER BY s1
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |         AS cb FROM g1),
        |a1 AS (SELECT sum(pos * (cb + (cnt + 1) / 2)) AS rank_sum,
        |         sum(pos) AS p, sum(cnt) AS n FROM c1),
        |g2 AS (SELECT s2, CAST(count(*) AS DOUBLE) AS cnt,
        |         sum(is_r) AS pos FROM d GROUP BY s2),
        |c2 AS (SELECT *, coalesce(sum(cnt) OVER (ORDER BY s2
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |         AS cb FROM g2),
        |a2 AS (SELECT sum(pos * (cb + (cnt + 1) / 2)) AS rank_sum,
        |         sum(pos) AS p, sum(cnt) AS n FROM c2)
        |SELECT 'auc_dense' AS metric, round((rank_sum - p * (p + 1) / 2)
        |  / (p * (n - p)), 6) AS value FROM a2
        |UNION ALL
        |SELECT 'auc_ties', round((rank_sum - p * (p + 1) / 2)
        |  / (p * (n - p)), 6) FROM a1
        |ORDER BY metric""".stripMargin,

    "q_retrieval_report" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS lq
        |           FROM embeddings WHERE vec_id < 10),
        |x AS (SELECT query_id, vec_id, lq, label AS lbl_n,
        |        unnest(qe)::DOUBLE AS a, unnest(embedding)::DOUBLE AS b
        |      FROM q, embeddings WHERE vec_id != query_id),
        |c AS (SELECT query_id, vec_id, any_value(lq) AS lq,
        |        any_value(lbl_n) AS lbl_n,
        |        sum(a*b)/(sqrt(sum(a*a))*sqrt(sum(b*b))) AS cos
        |      FROM x GROUP BY 1, 2),
        |r AS (SELECT query_id, vec_id, lq, lbl_n, cos,
        |        row_number() OVER (PARTITION BY query_id
        |          ORDER BY cos DESC, vec_id) AS rank FROM c),
        |pl AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
        |k AS (SELECT query_id, rank,
        |        CASE WHEN lq = lbl_n THEN 1 ELSE 0 END AS rel,
        |        pl.n - 1 AS total_rel
        |      FROM r JOIN pl ON r.lq = pl.label WHERE rank <= 5),
        |s AS (SELECT query_id,
        |        min(CASE WHEN rel = 1 THEN rank END) AS fr,
        |        sum(rel) AS hits, max(total_rel) AS tot
        |      FROM k GROUP BY 1)
        |SELECT query_id,
        |  round(coalesce(1.0 / fr, 0.0), 6) AS mrr,
        |  round(CAST(hits AS DOUBLE) / 5, 6) AS p_at_5,
        |  round(CASE WHEN tot = 0 THEN 0.0
        |        ELSE CAST(hits AS DOUBLE) / tot END, 6) AS r_at_5
        |FROM s ORDER BY query_id""".stripMargin,

    "q_ndcg" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS lq
        |           FROM embeddings WHERE vec_id < 10),
        |x AS (SELECT query_id, vec_id, lq, label AS lbl_n,
        |        unnest(qe)::DOUBLE AS a, unnest(embedding)::DOUBLE AS b
        |      FROM q, embeddings WHERE vec_id != query_id),
        |c AS (SELECT query_id, vec_id, any_value(lq) AS lq,
        |        any_value(lbl_n) AS lbl_n,
        |        sum(a*b)/(sqrt(sum(a*a))*sqrt(sum(b*b))) AS cos
        |      FROM x GROUP BY 1, 2),
        |r AS (SELECT query_id, vec_id, lq, lbl_n, cos,
        |        row_number() OVER (PARTITION BY query_id
        |          ORDER BY cos DESC, vec_id) AS rank FROM c),
        |k AS (SELECT query_id, rank,
        |        CASE WHEN lq = lbl_n THEN 1 ELSE 0 END AS rel
        |      FROM r WHERE rank <= 5),
        |i AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY rel DESC, rank) AS ir FROM k),
        |s AS (SELECT query_id,
        |        sum(CAST(rel AS DOUBLE) / (ln(rank + 1) / ln(2.0))) AS dcg,
        |        sum(CAST(rel AS DOUBLE) / (ln(ir + 1) / ln(2.0))) AS idcg
        |      FROM i GROUP BY 1)
        |SELECT query_id,
        |  round(CASE WHEN idcg = 0 THEN 0.0 ELSE dcg / idcg END, 6) AS ndcg
        |FROM s ORDER BY query_id""".stripMargin,

    "q_mcc_kappa" ->
      """WITH d AS (SELECT l_returnflag AS y3,
        |    CASE WHEN l_quantity > 35 THEN 'R'
        |         WHEN l_quantity > 15 THEN 'N' ELSE 'A' END AS p3,
        |    CASE WHEN l_returnflag = 'R' THEN '1' ELSE '0' END AS yb,
        |    CASE WHEN l_discount > 0.05 THEN '1' ELSE '0' END AS pb
        |  FROM lineitem),
        |cm3 AS (SELECT y3 AS label, p3 AS pred, count(*) AS n FROM d GROUP BY 1, 2),
        |m3 AS (SELECT coalesce(t.t, 0) AS t, coalesce(p.p, 0) AS p FROM
        |    (SELECT label AS clazz, CAST(sum(n) AS DOUBLE) AS t FROM cm3 GROUP BY 1) t
        |  FULL OUTER JOIN
        |    (SELECT pred AS clazz, CAST(sum(n) AS DOUBLE) AS p FROM cm3 GROUP BY 1) p
        |  USING (clazz)),
        |s3 AS (SELECT (SELECT CAST(sum(n) AS DOUBLE) FROM cm3) AS s,
        |    (SELECT CAST(sum(CASE WHEN label = pred THEN n ELSE 0 END) AS DOUBLE)
        |       FROM cm3) AS c,
        |    sum(t * p) AS tp, sum(t * t) AS tt, sum(p * p) AS pp FROM m3),
        |cmb AS (SELECT yb AS label, pb AS pred, count(*) AS n FROM d GROUP BY 1, 2),
        |mb AS (SELECT coalesce(t.t, 0) AS t, coalesce(p.p, 0) AS p FROM
        |    (SELECT label AS clazz, CAST(sum(n) AS DOUBLE) AS t FROM cmb GROUP BY 1) t
        |  FULL OUTER JOIN
        |    (SELECT pred AS clazz, CAST(sum(n) AS DOUBLE) AS p FROM cmb GROUP BY 1) p
        |  USING (clazz)),
        |sb AS (SELECT (SELECT CAST(sum(n) AS DOUBLE) FROM cmb) AS s,
        |    (SELECT CAST(sum(CASE WHEN label = pred THEN n ELSE 0 END) AS DOUBLE)
        |       FROM cmb) AS c,
        |    sum(t * p) AS tp, sum(t * t) AS tt, sum(p * p) AS pp FROM mb)
        |SELECT 'kappa_binary' AS metric, round((c / s - tp / (s * s))
        |  / (1 - tp / (s * s)), 6) AS value FROM sb
        |UNION ALL
        |SELECT 'kappa_multi', round((c / s - tp / (s * s))
        |  / (1 - tp / (s * s)), 6) FROM s3
        |UNION ALL
        |SELECT 'mcc_binary', round((c * s - tp)
        |  / sqrt((s * s - pp) * (s * s - tt)), 6) FROM sb
        |UNION ALL
        |SELECT 'mcc_multi', round((c * s - tp)
        |  / sqrt((s * s - pp) * (s * s - tt)), 6) FROM s3
        |ORDER BY metric""".stripMargin,

    "q_pr_auc" ->
      """WITH d AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END
        |    AS is_r, l_discount AS s1, l_extendedprice AS s2 FROM lineitem),
        |g1 AS (SELECT s1, CAST(count(*) AS DOUBLE) AS cnt,
        |         sum(is_r) AS pos FROM d GROUP BY s1),
        |c1 AS (SELECT *,
        |         sum(pos) OVER (ORDER BY s1 DESC
        |           ROWS UNBOUNDED PRECEDING) AS cumtp,
        |         sum(cnt) OVER (ORDER BY s1 DESC
        |           ROWS UNBOUNDED PRECEDING) AS cumall FROM g1),
        |a1 AS (SELECT sum(pos * cumtp / cumall) AS num, sum(pos) AS p
        |       FROM c1),
        |g2 AS (SELECT s2, CAST(count(*) AS DOUBLE) AS cnt,
        |         sum(is_r) AS pos FROM d GROUP BY s2),
        |c2 AS (SELECT *,
        |         sum(pos) OVER (ORDER BY s2 DESC
        |           ROWS UNBOUNDED PRECEDING) AS cumtp,
        |         sum(cnt) OVER (ORDER BY s2 DESC
        |           ROWS UNBOUNDED PRECEDING) AS cumall FROM g2),
        |a2 AS (SELECT sum(pos * cumtp / cumall) AS num, sum(pos) AS p
        |       FROM c2)
        |SELECT 'ap_dense' AS metric, round(num / p, 6) AS value FROM a2
        |UNION ALL SELECT 'ap_ties', round(num / p, 6) FROM a1
        |ORDER BY metric""".stripMargin,

    "q_ece" ->
      """WITH d AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END
        |    AS is_r, l_discount * 10 AS p FROM lineitem),
        |b AS (SELECT CAST(least(floor(p * 10), 9) AS INT) AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    round(abs(round(avg(p), 6) - round(avg(is_r), 6)), 6) AS gap
        |  FROM d GROUP BY 1)
        |SELECT round(sum(n * gap) / sum(n), 6) AS ece, max(gap) AS mce,
        |  CAST(sum(n) AS BIGINT) AS n FROM b""".stripMargin,
    "q_calibration" ->
      """WITH d AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END
        |    AS is_r, l_discount * 10 AS p FROM lineitem)
        |SELECT CAST(least(floor(p * 10), 9) AS INT) AS bin, count(*) AS n,
        | round(avg(p), 6) AS mean_p, round(avg(is_r), 6) AS frac_pos,
        | round(abs(round(avg(p), 6) - round(avg(is_r), 6)), 6) AS gap
        |FROM d GROUP BY 1 ORDER BY bin""".stripMargin,

    "q_metrics_regression" ->
      """WITH d AS (SELECT l_extendedprice AS y,
        |  l_extendedprice * (1.0 - l_discount) AS p, l_quantity AS w FROM lineitem)
        |SELECT * FROM (
        | SELECT 'mse' AS metric, round(avg((p-y)*(p-y)), 6) AS value FROM d
        | UNION ALL SELECT 'rmse', round(sqrt(avg((p-y)*(p-y))), 6) FROM d
        | UNION ALL SELECT 'mae', round(avg(abs(p-y)), 6) FROM d
        | UNION ALL SELECT 'mape',
        |   round(avg(abs(p-y)/greatest(abs(y), 2.220446049250313e-16)), 6) FROM d
        | UNION ALL SELECT 'r2', round(1.0 - sum((y-p)*(y-p)) /
        |   (sum(y*y) - sum(y)*sum(y)/count(*)), 6) FROM d
        | UNION ALL SELECT 'msle', round(avg((ln(1+p)-ln(1+y))*(ln(1+p)-ln(1+y))), 6) FROM d
        | UNION ALL SELECT 'mae_weighted', round(sum(abs(p-y)*w)/sum(w), 6) FROM d
        |) ORDER BY metric""".stripMargin,
    "q_metrics_multioutput" ->
      """WITH d AS (SELECT l_quantity AS y0, l_quantity * 0.9 + 1.0 AS p0,
        |  l_extendedprice AS y1,
        |  l_extendedprice * (1.0 - l_discount) AS p1 FROM lineitem),
        |m AS (SELECT
        |  avg(abs(p0-y0)) AS mae0, avg(abs(p1-y1)) AS mae1,
        |  avg(abs(p0-y0)/greatest(abs(y0), 2.220446049250313e-16)) AS mape0,
        |  avg(abs(p1-y1)/greatest(abs(y1), 2.220446049250313e-16)) AS mape1,
        |  avg((p0-y0)*(p0-y0)) AS mse0, avg((p1-y1)*(p1-y1)) AS mse1,
        |  (1.0 - sum((y0-p0)*(y0-p0)) / (sum(y0*y0) - sum(y0)*sum(y0)/count(*))
        |   + 1.0 - sum((y1-p1)*(y1-p1)) / (sum(y1*y1) - sum(y1)*sum(y1)/count(*)))
        |    / 2.0 AS r2a
        | FROM d)
        |SELECT * FROM (
        | SELECT 'mae' AS metric, round(mae0, 6) AS out_0, round(mae1, 6) AS out_1,
        |   round((mae0+mae1)/2.0, 6) AS uniform_avg FROM m
        | UNION ALL SELECT 'mape', round(mape0, 6), round(mape1, 6),
        |   round((mape0+mape1)/2.0, 6) FROM m
        | UNION ALL SELECT 'mse', round(mse0, 6), round(mse1, 6),
        |   round((mse0+mse1)/2.0, 6) FROM m
        | UNION ALL SELECT 'r2_avg', round(r2a, 6), round(r2a, 6), round(r2a, 6) FROM m
        |) ORDER BY metric""".stripMargin,
    "q_metrics_classification" ->
      """WITH d AS (SELECT l_returnflag AS y,
        |  CASE WHEN l_quantity > 25 THEN 'R' ELSE 'A' END AS pred,
        |  CAST(l_returnflag = 'R' AS DOUBLE) AS is_r,
        |  least(greatest(l_discount * 10, 1e-15), 1.0 - 1e-15) AS prob,
        |  l_quantity AS w FROM lineitem)
        |SELECT * FROM (
        | SELECT 'accuracy' AS metric,
        |   round(avg(CASE WHEN y = pred THEN 1.0 ELSE 0.0 END), 6) AS value FROM d
        | UNION ALL SELECT 'accuracy_weighted',
        |   round(sum(CASE WHEN y = pred THEN 1.0 ELSE 0.0 END * w)/sum(w), 6) FROM d
        | UNION ALL SELECT 'hits',
        |   round(sum(CASE WHEN y = pred THEN 1.0 ELSE 0.0 END), 6) FROM d
        | UNION ALL SELECT 'log_loss',
        |   round(avg(-(is_r*ln(prob) + (1.0-is_r)*ln(1.0-prob))), 6) FROM d
        |) ORDER BY metric""".stripMargin,
    "q_log_loss_multi" ->
      """WITH d AS (SELECT
        |  CASE WHEN l_returnflag='A' THEN 0 WHEN l_returnflag='N' THEN 1
        |       ELSE 2 END AS y,
        |  least(greatest(0.2 + l_discount, 1e-15), 1.0 - 1e-15) AS p0,
        |  least(greatest(0.5, 1e-15), 1.0 - 1e-15) AS p1,
        |  least(greatest(0.01 * l_quantity, 1e-15), 1.0 - 1e-15) AS p2,
        |  l_quantity AS w FROM lineitem),
        |e AS (SELECT w,
        |  -ln((CASE WHEN y=0 THEN p0 WHEN y=1 THEN p1 ELSE p2 END)
        |      / (p0 + p1 + p2)) AS ll FROM d)
        |SELECT * FROM (
        | SELECT 'log_loss_multi' AS metric, round(avg(ll), 6) AS value FROM e
        | UNION ALL
        | SELECT 'log_loss_multi_weighted', round(sum(ll*w)/sum(w), 6) FROM e
        |) ORDER BY metric""".stripMargin,
    "q_scorers" ->
      """WITH d AS (SELECT l_extendedprice AS y,
        |  l_extendedprice * (1.0 - l_discount) AS p,
        |  CAST(l_quantity > 25 AS DOUBLE) AS ycls,
        |  CAST(l_discount > 0.05 AS DOUBLE) AS pcls FROM lineitem)
        |SELECT * FROM (
        | SELECT 'r2' AS metric, round(1.0 - sum((y-p)*(y-p)) /
        |   (sum(y*y) - sum(y)*sum(y)/count(*)), 6) AS value FROM d
        | UNION ALL SELECT 'neg_mean_squared_error',
        |   round(-avg((p-y)*(p-y)), 6) FROM d
        | UNION ALL SELECT 'accuracy',
        |   round(avg(CASE WHEN ycls = pcls THEN 1.0 ELSE 0.0 END), 6) FROM d
        |) ORDER BY metric""".stripMargin,
    "q_gnb_fit" ->
      """SELECT l_returnflag AS cls,
        | round(count(*) / (SELECT count(*) FROM lineitem), 6) AS prior,
        | round(avg(l_quantity), 6) AS mean_qty,
        | round(avg(l_extendedprice), 6) AS mean_price,
        | round(var_pop(l_quantity) + 1e-9 * (SELECT max(greatest(vq, vp)) FROM
        |   (SELECT var_pop(l_quantity) AS vq, var_pop(l_extendedprice) AS vp
        |    FROM lineitem GROUP BY l_returnflag)), 6) AS var_qty,
        | round(var_pop(l_extendedprice) + 1e-9 * (SELECT max(greatest(vq, vp)) FROM
        |   (SELECT var_pop(l_quantity) AS vq, var_pop(l_extendedprice) AS vp
        |    FROM lineitem GROUP BY l_returnflag)), 6) AS var_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY cls""".stripMargin,
    "q_gnb_proba" ->
      """WITH s AS (SELECT l_returnflag AS cls, count(*) AS n,
        |   avg(l_quantity) AS mq, var_pop(l_quantity) AS vq,
        |   avg(l_extendedprice) AS mp, var_pop(l_extendedprice) AS vp
        | FROM lineitem GROUP BY 1),
        | mv AS (SELECT max(greatest(vq, vp)) AS m FROM s),
        | tot AS (SELECT sum(n) AS t FROM s),
        | w AS (SELECT
        |   max(CASE WHEN cls='A' THEN mq END) AS a_mq, max(CASE WHEN cls='A' THEN vq END) + 1e-9*(SELECT m FROM mv) AS a_vq,
        |   max(CASE WHEN cls='A' THEN mp END) AS a_mp, max(CASE WHEN cls='A' THEN vp END) + 1e-9*(SELECT m FROM mv) AS a_vp,
        |   max(CASE WHEN cls='A' THEN n END) / (SELECT t FROM tot) AS a_pr,
        |   max(CASE WHEN cls='N' THEN mq END) AS n_mq, max(CASE WHEN cls='N' THEN vq END) + 1e-9*(SELECT m FROM mv) AS n_vq,
        |   max(CASE WHEN cls='N' THEN mp END) AS n_mp, max(CASE WHEN cls='N' THEN vp END) + 1e-9*(SELECT m FROM mv) AS n_vp,
        |   max(CASE WHEN cls='N' THEN n END) / (SELECT t FROM tot) AS n_pr,
        |   max(CASE WHEN cls='R' THEN mq END) AS r_mq, max(CASE WHEN cls='R' THEN vq END) + 1e-9*(SELECT m FROM mv) AS r_vq,
        |   max(CASE WHEN cls='R' THEN mp END) AS r_mp, max(CASE WHEN cls='R' THEN vp END) + 1e-9*(SELECT m FROM mv) AS r_vp,
        |   max(CASE WHEN cls='R' THEN n END) / (SELECT t FROM tot) AS r_pr
        | FROM s),
        | j AS (SELECT l_orderkey, l_linenumber,
        |   ln(a_pr) - 0.5*ln(2*pi()*a_vq) - (l_quantity-a_mq)*(l_quantity-a_mq)/(2*a_vq)
        |           - 0.5*ln(2*pi()*a_vp) - (l_extendedprice-a_mp)*(l_extendedprice-a_mp)/(2*a_vp) AS jll_a,
        |   ln(n_pr) - 0.5*ln(2*pi()*n_vq) - (l_quantity-n_mq)*(l_quantity-n_mq)/(2*n_vq)
        |           - 0.5*ln(2*pi()*n_vp) - (l_extendedprice-n_mp)*(l_extendedprice-n_mp)/(2*n_vp) AS jll_n,
        |   ln(r_pr) - 0.5*ln(2*pi()*r_vq) - (l_quantity-r_mq)*(l_quantity-r_mq)/(2*r_vq)
        |           - 0.5*ln(2*pi()*r_vp) - (l_extendedprice-r_mp)*(l_extendedprice-r_mp)/(2*r_vp) AS jll_r
        | FROM lineitem, w),
        | e AS (SELECT l_orderkey, l_linenumber,
        |   exp(jll_a - greatest(jll_a, jll_n, jll_r)) AS ea,
        |   exp(jll_n - greatest(jll_a, jll_n, jll_r)) AS en,
        |   exp(jll_r - greatest(jll_a, jll_n, jll_r)) AS er
        | FROM j)
        |SELECT l_orderkey, l_linenumber,
        | round(ea / (ea + en + er), 6) AS proba_a,
        | round(en / (ea + en + er), 6) AS proba_n,
        | round(er / (ea + en + er), 6) AS proba_r
        |FROM e ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_gnb_predict" ->
      """WITH s AS (SELECT l_returnflag AS cls, count(*) AS n,
        |   avg(l_quantity) AS mq, var_pop(l_quantity) AS vq,
        |   avg(l_extendedprice) AS mp, var_pop(l_extendedprice) AS vp
        | FROM lineitem GROUP BY 1),
        | mv AS (SELECT max(greatest(vq, vp)) AS m FROM s),
        | tot AS (SELECT sum(n) AS t FROM s),
        | w AS (SELECT
        |   max(CASE WHEN cls='A' THEN mq END) AS a_mq, max(CASE WHEN cls='A' THEN vq END) + 1e-9*(SELECT m FROM mv) AS a_vq,
        |   max(CASE WHEN cls='A' THEN mp END) AS a_mp, max(CASE WHEN cls='A' THEN vp END) + 1e-9*(SELECT m FROM mv) AS a_vp,
        |   max(CASE WHEN cls='A' THEN n END) / (SELECT t FROM tot) AS a_pr,
        |   max(CASE WHEN cls='N' THEN mq END) AS n_mq, max(CASE WHEN cls='N' THEN vq END) + 1e-9*(SELECT m FROM mv) AS n_vq,
        |   max(CASE WHEN cls='N' THEN mp END) AS n_mp, max(CASE WHEN cls='N' THEN vp END) + 1e-9*(SELECT m FROM mv) AS n_vp,
        |   max(CASE WHEN cls='N' THEN n END) / (SELECT t FROM tot) AS n_pr,
        |   max(CASE WHEN cls='R' THEN mq END) AS r_mq, max(CASE WHEN cls='R' THEN vq END) + 1e-9*(SELECT m FROM mv) AS r_vq,
        |   max(CASE WHEN cls='R' THEN mp END) AS r_mp, max(CASE WHEN cls='R' THEN vp END) + 1e-9*(SELECT m FROM mv) AS r_vp,
        |   max(CASE WHEN cls='R' THEN n END) / (SELECT t FROM tot) AS r_pr
        | FROM s),
        | j AS (SELECT l_orderkey, l_linenumber,
        |   ln(a_pr) - 0.5*ln(2*pi()*a_vq) - (l_quantity-a_mq)*(l_quantity-a_mq)/(2*a_vq)
        |           - 0.5*ln(2*pi()*a_vp) - (l_extendedprice-a_mp)*(l_extendedprice-a_mp)/(2*a_vp) AS jll_a,
        |   ln(n_pr) - 0.5*ln(2*pi()*n_vq) - (l_quantity-n_mq)*(l_quantity-n_mq)/(2*n_vq)
        |           - 0.5*ln(2*pi()*n_vp) - (l_extendedprice-n_mp)*(l_extendedprice-n_mp)/(2*n_vp) AS jll_n,
        |   ln(r_pr) - 0.5*ln(2*pi()*r_vq) - (l_quantity-r_mq)*(l_quantity-r_mq)/(2*r_vq)
        |           - 0.5*ln(2*pi()*r_vp) - (l_extendedprice-r_mp)*(l_extendedprice-r_mp)/(2*r_vp) AS jll_r
        | FROM lineitem, w)
        |SELECT l_orderkey, l_linenumber,
        | CASE WHEN jll_a >= jll_n AND jll_a >= jll_r THEN 'A'
        |      WHEN jll_n >= jll_r THEN 'N' ELSE 'R' END AS prediction
        |FROM j ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
