package graft.modelselection

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, concat, lit}

import graft.core.{QueryPack, Tables}
import graft.wrappers.{LinearLocalModel, LocalModel, OnlineEstimator, OnlineState}

/** Deterministic estimator whose score is a pure function of its
  * parameter, ignoring the training data entirely — the reference's
  * `ConstantFunction` test double (dask_ml/_utils.py:27-52). It makes
  * an adaptive search's rung/survivor schedule closed-form, which is
  * what lets SuccessiveHalving be pinned against a literal-table
  * oracle.
  */
class ConstantScoreEstimator(value: Double) extends OnlineEstimator {
  def init(nFeatures: Int): OnlineState =
    OnlineState(Array.fill(nFeatures)(0.0), value, 0L)
  def partialFit(s: OnlineState, xs: Array[Array[Double]],
      y: Array[Double]): OnlineState =
    s.copy(seen = s.seen + xs.length)
  def model(s: OnlineState): LocalModel = LinearLocalModel(s.weights, s.intercept)
}

/** Oracle-verified queries for the adaptive-search family
  * (IncrementalSearchCV / SuccessiveHalvingSearchCV / HyperbandSearchCV,
  * SURVEY.md §2.5 rows 29-31).
  *
  * Neither query trains a real model — that is the point. The
  * Hyperband bracket schedule is pure arithmetic pinned by the paper
  * (Li et al., JMLR 18(185), 2018; the reference's own test pins the
  * same counts, tests/model_selection/test_hyperband.py:98-101 —
  * models {9:17, 27:49, 81:143}, partial_fit calls {9:69, 27:357,
  * 81:1581}), and a SuccessiveHalving run over constant-score
  * estimators has a closed-form rung/survivor/calls schedule. Both
  * oracles are independently-derived literal tables, NOT mirrors of
  * the implementation.
  */
object AdaptiveSearchQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // OLS learning curve from ONE corpus pass (modelselection/
    // LearningCurve.scala): per-fraction conditional moments → every
    // point's fit + train/test MSE by the moment identities; nested
    // content-hash training prefixes, fixed 20% test split.
    "q_learning_curve" -> ((s, dir) =>
      LearningCurve.olsCurve(
        graft.core.Tables.lineitem(s, dir), "l_quantity",
        "l_extendedprice",
        concat(col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string")),
        fractions = Seq(0.1, 0.25, 0.5, 1.0))),

    // Planned bracket schedule for maxIter ∈ {9, 27, 81}: per bracket
    // the number of models and the total partial_fit calls if no early
    // stop (_hyperband.py:563-664 `metadata`).
    "q_hyperband_metadata" -> ((s, dir) => {
      import s.implicits._
      Seq(9, 27, 81).flatMap { maxIter =>
        AdaptiveSearch.hyperbandMetadata(maxIter).map { case (b, n, calls) =>
          (maxIter, b, n, calls)
        }
      }.toDF("max_iter", "bracket", "n_models", "partial_fit_calls")
        .orderBy("max_iter", "bracket")
    }),

    // One full SuccessiveHalving run (n=9, r=1, eta=3) over 9
    // constant-score candidates alpha ∈ {0.1 … 0.9}: rung 0 gives every
    // model 1 call; rung 1 keeps floor(9/3)=3 survivors (the top-3
    // alphas) trained to 3 calls; rung 2 would keep floor(9/9)=1 →
    // stop. The partial fits run as real single-partition Spark jobs on
    // the lineitem table; only the schedule is data-independent.
    "q_sha_survivor" -> ((s, dir) => {
      import s.implicits._
      val alphas: Seq[Any] = (1 to 9).map(_ / 10.0)
      val search = new SuccessiveHalvingSearchCV(
        params => new ConstantScoreEstimator(params("alpha").asInstanceOf[Double]),
        Map("alpha" -> alphas),
        Seq("l_quantity"), "l_tax",
        (m, _, _) => m.asInstanceOf[LinearLocalModel].intercept,
        nInitial = 9, r = 1, eta = 3.0, seed = 7)
      val res = search.fit(Tables.lineitem(s, dir))
      def r6(v: Double) =
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      res.history.map { rec =>
        (r6(rec.params("alpha").asInstanceOf[Double]), rec.calls, r6(rec.lastScore))
      }.sortBy(_._1).toDF("alpha", "calls", "score")
    })
  )

  /** Learning-curve mirror: the same one-aggregate conditional moments
    * (rounded 6) and the same ROUNDED staging — slope, then intercept
    * from the rounded slope, then both MSEs from the rounded pair. */
  private val learningCurveOracleSql: String = {
    val fracs = Seq(0.1, 0.25, 0.5, 1.0)
    def mom(tag: String, cond: String) = Seq(
      s"CAST(sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) AS n_$tag",
      s"round(avg(CASE WHEN $cond THEN x END), 6) AS ax_$tag",
      s"round(avg(CASE WHEN $cond THEN y END), 6) AS ay_$tag",
      s"round(avg(CASE WHEN $cond THEN x * x END), 6) AS axx_$tag",
      s"round(avg(CASE WHEN $cond THEN x * y END), 6) AS axy_$tag",
      s"round(avg(CASE WHEN $cond THEN y * y END), 6) AS ayy_$tag")
    val momCols = (fracs.zipWithIndex.flatMap { case (f, i) =>
      mom(s"t$i", s"bk < ${(800000L * f).toLong}")
    } ++ mom("te", "bk >= 800000")).mkString(",\n    ")
    val blocks = fracs.zipWithIndex.map { case (f, i) =>
      val t = s"t$i"
      s"""c$i AS (SELECT m.*, round((axy_$t - ax_$t * ay_$t)
         |    / (axx_$t - ax_$t * ax_$t), 6) AS sl FROM m),
         |d$i AS (SELECT c$i.*, round(ay_$t - sl * ax_$t, 6) AS ic
         |  FROM c$i),
         |e$i AS (SELECT CAST($f AS DOUBLE) AS fraction, n_$t AS n_train,
         |    sl AS slope, ic AS intercept,
         |    round(ayy_$t - 2 * sl * axy_$t - 2 * ic * ay_$t
         |      + sl * sl * axx_$t + 2 * sl * ic * ax_$t + ic * ic, 6)
         |      AS train_mse,
         |    round(ayy_te - 2 * sl * axy_te - 2 * ic * ay_te
         |      + sl * sl * axx_te + 2 * sl * ic * ax_te + ic * ic, 6)
         |      AS test_mse
         |  FROM d$i)""".stripMargin
    }.mkString(",\n")
    val union = fracs.indices.map(i => s"SELECT * FROM e$i")
      .mkString("\nUNION ALL ")
    s"""WITH b AS (SELECT l_quantity AS x, l_extendedprice AS y,
       |    ('0x' || substr(md5('lc' || CAST(l_orderkey AS VARCHAR)
       |      || '-' || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT
       |      % 1000000 AS bk
       |  FROM lineitem),
       |m AS (SELECT
       |    $momCols
       |  FROM b),
       |$blocks
       |$union
       |ORDER BY fraction""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "q_learning_curve" -> learningCurveOracleSql,
    // Paper-derived schedule (verified to sum to the reference's pinned
    // per-maxIter totals: 17/69, 49/357, 143/1581).
    "q_hyperband_metadata" ->
      """SELECT CAST(m AS INT) AS max_iter, CAST(b AS INT) AS bracket,
        | CAST(n AS INT) AS n_models, CAST(c AS INT) AS partial_fit_calls
        |FROM (VALUES
        | (9, 0, 3, 27), (9, 1, 5, 21), (9, 2, 9, 21),
        | (27, 0, 4, 108), (27, 1, 6, 90), (27, 2, 12, 78), (27, 3, 27, 81),
        | (81, 0, 5, 405), (81, 1, 8, 324), (81, 2, 15, 279),
        | (81, 3, 34, 276), (81, 4, 81, 297)) t(m, b, n, c)
        |ORDER BY max_iter, bracket""".stripMargin,
    // Closed-form SHA schedule: 6 losers at 1 call, top-3 survivors at
    // 3 calls; each model's score is its own alpha.
    "q_sha_survivor" ->
      """SELECT CAST(a AS DOUBLE) AS alpha, CAST(c AS INT) AS calls,
        | CAST(a AS DOUBLE) AS score
        |FROM (VALUES
        | (0.1, 1), (0.2, 1), (0.3, 1), (0.4, 1), (0.5, 1), (0.6, 1),
        | (0.7, 3), (0.8, 3), (0.9, 3)) t(a, c)
        |ORDER BY alpha""".stripMargin
  )
}
