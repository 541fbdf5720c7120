package graft.wrappers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryPack, Tables}
import graft.ensemble.BlockwiseVotingModel
import graft.linear.{LogisticRegressionModel, PoissonRegressionModel}
import graft.metrics.Pairwise

/** Oracle-verified queries for the model-application surface:
  * Logistic/Poisson predict (+proba), ParallelPostFit predict /
  * predict_proba / predict_log_proba, BlockwiseVoting hard+soft votes,
  * the pairwise distance/kernel module, Incremental(OnlineOLS), and the
  * Nyström embedding map.
  *
  * All use the fixed-parameter trick (as q_kmeans_lloyd_step does): the
  * model parameters are literals, so the full distributed
  * transform/vote/kernel path runs for real while the expected output
  * stays exactly SQL-expressible.
  */
object ModelQueries extends QueryPack {

  // fixed GLM coefficients over (l_quantity, l_discount)
  private val logregCoef = Array(0.1, -5.0); private val logregB = -2.0
  private val poisCoef = Array(0.05, 1.0); private val poisB = 0.1
  private val olsCoef = Array(2.0, -3.0); private val olsB = 1.0

  // three fixed logistic voters for the blockwise ensemble
  private val voters = Array(
    LogisticLocalModel(Array(0.1, -5.0), -2.0),
    LogisticLocalModel(Array(0.08, -2.0), -1.5),
    LogisticLocalModel(Array(-0.05, 3.0), 1.0))

  // three fixed linear voters for the blockwise regressor (mean vote)
  private val regVoters = Array(
    LinearLocalModel(Array(2.0, -3.0), 1.0),
    LinearLocalModel(Array(1.5, 2.0), 0.5),
    LinearLocalModel(Array(-1.0, 4.0), 2.0))

  // fixed pairwise Y block over (l_quantity, l_discount)
  private val yBlock = Array(Array(10.0, 0.02), Array(40.0, 0.06))

  // fixed Nyström landmarks/projection over (l_quantity/50, l_discount)
  private val landmarks = Array(
    Array(0.2, 0.02), Array(0.5, 0.04), Array(0.9, 0.07))
  private val proj = Array(
    Array(1.0, 0.5), Array(-0.5, 1.0), Array(0.25, -0.75))
  private val specGamma = 2.0

  private val feat = Seq("l_quantity", "l_discount")
  private def li(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
  private def keyed(df: DataFrame) =
    df.orderBy("l_orderkey", "l_linenumber")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_logreg_predict" -> ((s, dir) => {
      val m = new LogisticRegressionModel(feat, "l_quantity", logregCoef, logregB)
      keyed(m.transform(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("prediction").cast("int").as("pred")))
    }),

    "q_logreg_proba" -> ((s, dir) => {
      val m = new LogisticRegressionModel(feat, "l_quantity", logregCoef, logregB)
      keyed(m.predictProba(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("proba_0"), 6).as("proba_0"),
          round(col("proba_1"), 6).as("proba_1")))
    }),

    "q_poisson_predict" -> ((s, dir) => {
      val m = new PoissonRegressionModel(feat, "l_quantity", poisCoef, poisB)
      keyed(m.transform(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("prediction"), 6).as("pred")))
    }),

    "q_parallel_postfit" -> ((s, dir) => {
      val m = new ParallelPostFit(LinearLocalModel(olsCoef, olsB), feat)
      keyed(m.transform(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("prediction"), 6).as("pred")))
    }),

    "q_parallel_postfit_proba" -> ((s, dir) => {
      val m = new ParallelPostFit(LogisticLocalModel(logregCoef, logregB), feat)
      keyed(m.predictLogProba(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("log_proba_0"), 6).as("log_proba_0"),
          round(col("log_proba_1"), 6).as("log_proba_1")))
    }),

    "q_blockwise_vote" -> ((s, dir) => {
      val m = new BlockwiseVotingModel(feat,
        voters.map(v => v: LocalModel), voteMode = "majority")
      keyed(m.transform(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("prediction").cast("int").as("vote")))
    }),

    "q_blockwise_vote_soft" -> ((s, dir) => {
      val m = new BlockwiseVotingModel(feat,
        voters.map(v => v: LocalModel), voteMode = "soft")
      keyed(m.predictProba(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("proba_1"), 6).as("proba_1")))
    }),

    // BlockwiseVotingRegressor's mean-vote path over fixed linear
    // voters: prediction = (m1 + m2 + m3)/3, SQL-exact.
    "q_blockwise_regressor" -> ((s, dir) => {
      val m = new BlockwiseVotingModel(feat,
        regVoters.map(v => v: LocalModel), voteMode = "mean")
      keyed(m.transform(li(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("prediction"), 6).as("pred")))
    }),

    // The regressor mixin `score` (glm.py's RegressorMixin contract):
    // r2 of a fixed-coefficient model over the full table — the exact
    // single-pass sum-of-squares identity the Metrics module uses.
    "q_model_score" -> ((s, dir) => {
      val m = new graft.linear.LinearRegressionModel(feat, "l_extendedprice",
        olsCoef, olsB)
      val r2 = m.score(li(s, dir))
      import s.implicits._
      def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      Seq(r6(r2)).toDF("r2")
    }),

    "q_euclidean_distances" -> ((s, dir) =>
      keyed(Pairwise.euclideanDistances(li(s, dir), feat, yBlock)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("dist_0"), 6).as("dist_0"),
          round(col("dist_1"), 6).as("dist_1")))),

    "q_pairwise_argmin" -> ((s, dir) =>
      keyed(Pairwise.pairwiseDistancesArgminMin(li(s, dir), feat, yBlock)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("argmin"), round(col("min_dist"), 6).as("min_dist")))),

    "q_pairwise_kernels" -> ((s, dir) => {
      // five chained per-row kernel projections over a single-row-group
      // scan — fan out so the array math uses every core (r14)
      val base = graft.core.FanOut.byKey(li(s, dir), "l_orderkey")
      val withRbf = Pairwise.pairwiseKernels(base, feat,
        Array(yBlock(0)), metric = "rbf", gamma = 0.01, prefix = "rbf_")
      val withPoly = Pairwise.pairwiseKernels(withRbf, feat,
        Array(yBlock(0)), metric = "polynomial", gamma = 0.1, degree = 2,
        coef0 = 1.0, prefix = "poly_")
      val withSig = Pairwise.pairwiseKernels(withPoly, feat,
        Array(yBlock(0)), metric = "sigmoid", gamma = 0.01, coef0 = -1.0,
        prefix = "sig_")
      val withMan = Pairwise.pairwiseKernels(withSig, feat,
        Array(yBlock(0)), metric = "manhattan", prefix = "man_")
      val all = Pairwise.pairwiseKernels(withMan, feat,
        Array(yBlock(0)), metric = "cosine", prefix = "cos_")
      keyed(all.select(col("l_orderkey"), col("l_linenumber"),
        round(col("rbf_0"), 6).as("k_rbf"),
        round(col("poly_0"), 6).as("k_poly"),
        round(col("sig_0"), 6).as("k_sig"),
        round(col("man_0"), 6).as("k_man"),
        round(col("cos_0"), 6).as("k_cos")))
    }),

    // Incremental(OnlineOLS): sequential partial_fit over shuffled
    // partitions accumulates exact Gram sums → the final model equals
    // closed-form OLS regardless of visit order — oracle-exact.
    "q_incremental_ols" -> ((s, dir) => {
      val m = new Incremental(new OnlineOLS(), Seq("l_quantity"),
        "l_extendedprice", epochs = 1).fit(li(s, dir))
      val lm = m.model.asInstanceOf[LinearLocalModel]
      import s.implicits._
      def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      Seq((r6(lm.coef(0)), r6(lm.intercept))).toDF("slope", "intercept")
    }),

    // Nyström embedding from fixed landmarks+projection: the exact math
    // of SpectralClusteringModel.transform, expression-compiled.
    "q_spectral_embedding" -> ((s, dir) => {
      val scaled = li(s, dir)
        .withColumn("qn", col("l_quantity") / 50.0)
        .withColumn("dn", col("l_discount"))
      val es = graft.cluster.SpectralClustering.embedExprs(
        Seq("qn", "dn"), landmarks, proj, specGamma)
      keyed(scaled.select(col("l_orderkey"), col("l_linenumber"),
        round(es(0), 6).as("e_0"), round(es(1), 6).as("e_1")))
    })
  )

  // SQL mirrors reproduce the same arithmetic in the same association
  // order (left-assoc sums), so round-6 hashes match exactly.
  private val margin = s"((${logregB}) + (0.1 * l_quantity) + (-5.0 * l_discount))"

  def oracles: Map[String, String] = Map(
    "q_logreg_predict" ->
      s"""SELECT l_orderkey, l_linenumber,
         | CAST($margin > 0 AS INT) AS pred
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_logreg_proba" ->
      s"""SELECT l_orderkey, l_linenumber,
         | round(1.0 - 1.0/(1.0 + exp(-$margin)), 6) AS proba_0,
         | round(1.0/(1.0 + exp(-$margin)), 6) AS proba_1
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_poisson_predict" ->
      """SELECT l_orderkey, l_linenumber,
        | round(exp(0.1 + (0.05 * l_quantity) + (1.0 * l_discount)), 6) AS pred
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_parallel_postfit" ->
      """SELECT l_orderkey, l_linenumber,
        | round(1.0 + (2.0 * l_quantity) + (-3.0 * l_discount), 6) AS pred
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_parallel_postfit_proba" ->
      s"""SELECT l_orderkey, l_linenumber,
         | round(ln(1.0 - 1.0/(1.0 + exp(-$margin))), 6) AS log_proba_0,
         | round(ln(1.0/(1.0 + exp(-$margin))), 6) AS log_proba_1
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_blockwise_vote" -> {
      val m1 = "(((-2.0) + (0.1 * l_quantity) + (-5.0 * l_discount)) > 0)"
      val m2 = "(((-1.5) + (0.08 * l_quantity) + (-2.0 * l_discount)) > 0)"
      val m3 = "(((1.0) + (-0.05 * l_quantity) + (3.0 * l_discount)) > 0)"
      s"""SELECT l_orderkey, l_linenumber,
         | CAST(CAST($m1 AS INT) + CAST($m2 AS INT) + CAST($m3 AS INT) >= 2
         |   AS INT) AS vote
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
    },
    "q_blockwise_vote_soft" -> {
      val p1 = "1.0/(1.0 + exp(-((-2.0) + (0.1 * l_quantity) + (-5.0 * l_discount))))"
      val p2 = "1.0/(1.0 + exp(-((-1.5) + (0.08 * l_quantity) + (-2.0 * l_discount))))"
      val p3 = "1.0/(1.0 + exp(-((1.0) + (-0.05 * l_quantity) + (3.0 * l_discount))))"
      s"""SELECT l_orderkey, l_linenumber,
         | round((($p1) + ($p2) + ($p3)) / 3, 6) AS proba_1
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
    },
    "q_blockwise_regressor" -> {
      val m1 = "((1.0) + (2.0 * l_quantity) + (-3.0 * l_discount))"
      val m2 = "((0.5) + (1.5 * l_quantity) + (2.0 * l_discount))"
      val m3 = "((2.0) + (-1.0 * l_quantity) + (4.0 * l_discount))"
      s"""SELECT l_orderkey, l_linenumber,
         | round((($m1 + $m2) + $m3) / 3, 6) AS pred
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
    },
    "q_model_score" -> {
      val pred = "((1.0) + (2.0 * l_quantity) + (-3.0 * l_discount))"
      s"""SELECT round(1.0 - sum((l_extendedprice - $pred)*(l_extendedprice - $pred))
         |  / (sum(l_extendedprice*l_extendedprice)
         |     - pow(sum(l_extendedprice), 2)/count(*)), 6) AS r2
         |FROM lineitem""".stripMargin
    },
    "q_euclidean_distances" ->
      """SELECT l_orderkey, l_linenumber,
        | round(sqrt((l_quantity-10.0)*(l_quantity-10.0)
        |   + (l_discount-0.02)*(l_discount-0.02)), 6) AS dist_0,
        | round(sqrt((l_quantity-40.0)*(l_quantity-40.0)
        |   + (l_discount-0.06)*(l_discount-0.06)), 6) AS dist_1
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_pairwise_argmin" ->
      """WITH d AS (SELECT l_orderkey, l_linenumber,
        |  (l_quantity-10.0)*(l_quantity-10.0)
        |    + (l_discount-0.02)*(l_discount-0.02) AS d0,
        |  (l_quantity-40.0)*(l_quantity-40.0)
        |    + (l_discount-0.06)*(l_discount-0.06) AS d1
        | FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        | CASE WHEN d0 <= d1 THEN 0 ELSE 1 END AS argmin,
        | round(sqrt(least(d0, d1)), 6) AS min_dist
        |FROM d ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_pairwise_kernels" ->
      """WITH b AS (SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
        |  (l_quantity-10.0)*(l_quantity-10.0)
        |    + (l_discount-0.02)*(l_discount-0.02) AS sqd,
        |  (l_quantity*10.0) + (l_discount*0.02) AS dot
        | FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        | round(exp(sqd * -0.01), 6) AS k_rbf,
        | round(pow(dot * 0.1 + 1.0, 2), 6) AS k_poly,
        | round(CASE WHEN abs(dot * 0.01 + (-1.0)) > 20.0
        |   THEN sign(dot * 0.01 + (-1.0))
        |   ELSE (exp(2*(dot * 0.01 + (-1.0))) - 1)
        |     / (exp(2*(dot * 0.01 + (-1.0))) + 1) END, 6) AS k_sig,
        | round(abs(l_quantity - 10.0) + abs(l_discount - 0.02), 6) AS k_man,
        | round(1.0 - dot / (sqrt(l_quantity*l_quantity + l_discount*l_discount)
        |   * sqrt(10.0*10.0 + 0.02*0.02)), 6) + 0.0 AS k_cos
        |FROM b ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_incremental_ols" ->
      """SELECT round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        | round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept
        |FROM lineitem""".stripMargin,
    "q_spectral_embedding" -> {
      def k(i: Int) = {
        val lm = landmarks(i)
        s"exp(((qn-(${lm(0)}))*(qn-(${lm(0)})) + (dn-(${lm(1)}))*(dn-(${lm(1)}))) * (-$specGamma))"
      }
      s"""WITH s AS (SELECT l_orderkey, l_linenumber,
         |  l_quantity/50.0 AS qn, l_discount AS dn FROM lineitem),
         |kk AS (SELECT l_orderkey, l_linenumber,
         |  ${k(0)} AS k0, ${k(1)} AS k1, ${k(2)} AS k2 FROM s)
         |SELECT l_orderkey, l_linenumber,
         | round(((k0*${proj(0)(0)}) + (k1*(${proj(1)(0)})) + (k2*${proj(2)(0)}))
         |   / sqrt(greatest(k0+k1+k2, 1e-12)), 6) AS e_0,
         | round(((k0*${proj(0)(1)}) + (k1*${proj(1)(1)}) + (k2*(${proj(2)(1)})))
         |   / sqrt(greatest(k0+k1+k2, 1e-12)), 6) AS e_1
         |FROM kk ORDER BY l_orderkey, l_linenumber""".stripMargin
    }
  )
}
