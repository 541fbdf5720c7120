package graft.preprocessing

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryPack, Tables}

/** Oracle-verified queries for the preprocessing estimators
  * (SURVEY.md §2.1/§2.2). Each runs the real fit→transform flow on the
  * given sf dir; the DuckDB oracle recomputes the fit statistics with
  * window/scalar subqueries.
  */
object PreprocessingQueries extends QueryPack {

  private val key = Seq("l_orderkey", "l_linenumber")

  /** The q_feature_selection / q_select_kbest feature set: three
    * discretized lineitem features scored against l_returnflag. */
  private def fsScores(s: SparkSession, dir: String): DataFrame =
    FeatureSelection.scores(Tables.lineitem(s, dir),
      Seq(
        "ship_year" -> year(col("l_shipdate")),
        "quantity_bucket" -> floor(col("l_quantity") / 10).cast("int"),
        "discount_pct" -> round(col("l_discount") * 100).cast("int")),
      label = col("l_returnflag"))

  /** GBT fit memo (fit-once/gate-twice, Memos contract: driver-side
    * summaries only — the trajectory plus the ≤Π|bins| cell frame
    * collected as tuples). */
  private val gbtMemo = graft.core.Memos.register(
    new java.util.concurrent.ConcurrentHashMap[String,
      (Seq[graft.ensemble.Boosting.BoostRound],
        Seq[(Int, Int, Int, Long, Long, Long)])]())

  private def gbtFit(s: SparkSession, dir: String) =
    gbtMemo.computeIfAbsent(dir, _ => {
      val (traj, cells) = graft.ensemble.Boosting.fitBinned(
        Tables.lineitem(s, dir),
        Seq(
          "ship_year" -> year(col("l_shipdate")),
          "quantity_bucket" -> floor(col("l_quantity") / 10).cast("int"),
          "discount_pct" -> round(col("l_discount") * 100).cast("int")),
        label = col("l_returnflag") === "R", rounds = 3, eta = 0.5)
      (traj, cells.collect().map(r => (
        r.getAs[Int]("__b_ship_year"), r.getAs[Int]("__b_quantity_bucket"),
        r.getAs[Int]("__b_discount_pct"), r.getAs[Long]("n"),
        r.getAs[Long]("sy"), r.getAs[Long]("f_micro"))).toSeq)
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gradient-boosted stumps (ensemble/Boosting.scala): 3 rounds of
    // squared-loss boosting over the binned-cell sufficient statistics
    // — ONE corpus pass total; the trajectory (split choices, gains,
    // integer micro-unit leaf deltas) replays in DuckDB's own
    // chained-CTE arithmetic.
    "q_gbt_trajectory" -> ((s, dir) => {
      import s.implicits._
      gbtFit(s, dir)._1
        .map(r => (r.round, r.feature, r.threshold, r.gain,
          r.leftMicro, r.rightMicro))
        .toDF("round", "feature", "threshold", "gain",
          "left_micro", "right_micro")
        .orderBy("round")
    }),

    // The fitted model surface: final per-cell ensemble score in exact
    // integer micro-units (same fit, memoized).
    "q_gbt_cells" -> ((s, dir) => {
      import s.implicits._
      gbtFit(s, dir)._2
        .toDF("ship_year", "quantity_bucket", "discount_pct",
          "n", "sy", "f_micro")
        .orderBy("ship_year", "quantity_bucket", "discount_pct")
    }),

    // SelectKBest-family univariate scores (preprocessing/
    // FeatureSelection.scala): mutual information + contingency chi2
    // for all features in ONE exploded corpus pass; absent cells enter
    // chi2 via the Σe identity, never materialized.
    "q_feature_selection" -> ((s, dir) =>
      fsScores(s, dir).orderBy("feature")),

    // Top-k (k=2) by MI with name tiebreak — the SelectKBest surface;
    // the ordered prefix runs over the ≤|features| score frame only.
    "q_select_kbest" -> ((s, dir) =>
      FeatureSelection.selectKBest(fsScores(s, dir), k = 2)),

    // mRMR greedy selection (Peng 2005 MID): relevance from the same
    // one-pass label-MI frame, redundancy from ONE pair-MI pass
    // (FeatureSelection.pairScores), greedy over the two bounded
    // frames with each step's score re-rounded before the argmax —
    // the oracle replays the full greedy path with rank CTEs.
    "q_mrmr_select" -> ((s, dir) =>
      FeatureSelection.mrmrSelect(fsScores(s, dir),
        FeatureSelection.pairScores(Tables.lineitem(s, dir),
          Seq(
            "ship_year" -> year(col("l_shipdate")),
            "quantity_bucket" -> floor(col("l_quantity") / 10).cast("int"),
            "discount_pct" -> round(col("l_discount") * 100).cast("int"))),
        k = 3)
        .orderBy("rnk")),

    // Histogram decision-stump split finding (ensemble/Stump.scala):
    // per-feature best Gini split from ONE exploded corpus pass + the
    // XGBoost-style prefix evaluation over the bin histogram; decrease
    // rounded before the argmax, ties to the smallest threshold.
    "q_decision_stump" -> ((s, dir) =>
      graft.ensemble.Stump.bestSplits(Tables.lineitem(s, dir),
        Seq(
          "ship_year" -> year(col("l_shipdate")),
          "quantity_bucket" -> floor(col("l_quantity") / 10).cast("int"),
          "discount_pct" -> round(col("l_discount") * 100).cast("int")),
        label = col("l_returnflag") === "R")
        .orderBy("feature")),

    "q_standard_scaler_fit" -> ((s, dir) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      val m = new StandardScaler(cols).fit(Tables.lineitem(s, dir))
      import s.implicits._
      cols.indices.map(i => (cols(i),
          BigDecimal(m.means(i)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(m.scales(i)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .toDF("feature", "mean", "std").orderBy("feature")
    }),

    "q_standard_scaler_transform" -> ((s, dir) => {
      val cols = Seq("l_quantity", "l_extendedprice")
      val li = Tables.lineitem(s, dir)
      val out = new StandardScaler(cols).fit(li).transform(li)
      out.select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity"), 6).as("scaled_qty"),
        round(col("l_extendedprice"), 6).as("scaled_price"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q_minmax_scaler_transform" -> ((s, dir) => {
      val cols = Seq("l_quantity", "l_extendedprice")
      val li = Tables.lineitem(s, dir)
      val out = new MinMaxScaler(cols).fit(li).transform(li)
      out.select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity"), 6).as("mm_qty"),
        round(col("l_extendedprice"), 6).as("mm_price"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q_robust_scaler_fit" -> ((s, dir) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_tax")
      val m = new RobustScaler(cols, exact = true).fit(Tables.lineitem(s, dir))
      import s.implicits._
      cols.indices.map(i => (cols(i),
          BigDecimal(m.centers(i)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(m.scales(i)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .toDF("feature", "center", "iqr").orderBy("feature")
    }),

    "q_simple_imputer_mean" -> ((s, dir) => {
      // synthesize nulls (l_tax=0 → null), then mean-impute
      val li = Tables.lineitem(s, dir)
        .withColumn("l_tax", when(col("l_tax") === 0, lit(null)).otherwise(col("l_tax")))
      val out = new SimpleImputer(Seq("l_tax"), "mean").fit(li).transform(li)
      out.select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_tax"), 6).as("tax_imputed"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q_simple_imputer_mode" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("flag", when(col("l_returnflag") === "N", lit(null))
          .otherwise(col("l_returnflag")))
      val out = new SimpleImputer(Seq("flag"), "most_frequent").fit(li).transform(li)
      out.groupBy("flag").agg(count(lit(1)).as("cnt")).orderBy("flag")
    }),

    "q_label_encoder" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val m = new LabelEncoder("l_returnflag", "flag_code").fit(li)
      m.transform(li)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("flag_code").cast("long").as("flag_code"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q_ordinal_encoder" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val m = new OrdinalEncoder(Seq("l_returnflag", "l_linestatus")).fit(li)
      m.transform(li)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag").cast("long").as("flag_code"),
          col("l_linestatus").cast("long").as("status_code"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q_dummy_encoder" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val m = new DummyEncoder(Seq("l_returnflag")).fit(li)
      m.transform(li)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag_A").cast("int").as("flag_a"),
          col("l_returnflag_N").cast("int").as("flag_n"),
          col("l_returnflag_R").cast("int").as("flag_r"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q_poly_features" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val m = new PolynomialFeatures(Seq("l_quantity", "l_discount"), degree = 2)
        .fit(li)
      m.transform(li).select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity"), 6).as("x1"),
        round(col("l_discount"), 6).as("x2"),
        round(col("`l_quantity^2`"), 6).as("x1_sq"),
        round(col("`l_quantity*l_discount`"), 6).as("x1x2"),
        round(col("`l_discount^2`"), 6).as("x2_sq"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // QuantileTransformer with the exact single-pass fit: DuckDB
    // reproduces the quantile table (quantile_cont with a ref list) and
    // the two-sided interpolation, mirroring the arithmetic exactly.
    "q_quantile_transform" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val m = new QuantileTransformer(Seq("l_extendedprice"),
        nQuantiles = 200, exact = true).fit(li)
      m.transform(li).select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 6).as("q_uniform"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Pipeline: each stage fitted on the PREVIOUS stage's output —
    // minmax of the standard-scaled column, both fits reproduced in SQL.
    "q_pipeline" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val pipe = new graft.compose.Pipeline(Seq(
        "std" -> new StandardScaler(Seq("l_quantity")),
        "mm" -> new MinMaxScaler(Seq("l_quantity"))))
      pipe.fit(li).transform(li)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 6).as("scaled"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ColumnTransformer: DIFFERENT estimators on different column
    // subsets, one frame, no join — the hstack-of-blocks semantics
    // (compose/_column_transformer.py:172-200) as sequential in-place
    // column transforms.
    "q_column_transformer" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val ct = new graft.compose.ColumnTransformer(Seq(
        "std" -> new StandardScaler(Seq("l_quantity")),
        "mm" -> new MinMaxScaler(Seq("l_discount"))))
      ct.fit(li).transform(li)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 6).as("q_std"),
          round(col("l_discount"), 6).as("d_mm"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Full reference ColumnTransformer parameter surface
    // (compose/_column_transformer.py:33-68): an estimator slot, a
    // 'passthrough' slot, a 'drop' slot, and remainder='passthrough' —
    // output is the sklearn hstack order (spec sets, then remainder).
    // The dropped column (l_discount) and the passthrough/remainder
    // columns pin every policy branch in one exact gate.
    "q_column_transformer_spec" -> ((s, dir) => {
      import graft.compose.{ColumnTransformerSpec, TransformerSpec}
      val li = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_tax", "l_discount")
      val ct = new ColumnTransformerSpec(Seq(
        ("std", TransformerSpec.Est(cols => new StandardScaler(cols)), Seq("l_quantity")),
        ("keep", TransformerSpec("passthrough"), Seq("l_tax")),
        ("deny", TransformerSpec("drop"), Seq("l_discount"))),
        remainder = TransformerSpec("passthrough"))
      ct.fit(li).transform(li)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 6).as("q_std"), col("l_tax"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // FeatureUnion: two branches over the SAME source column fitted on
    // the SAME input (fan-out, not a chain), hstacked as namespaced
    // copies, with a transformer_weight on the mm branch — the
    // feature_union/feature_union_concat semantics
    // (_search.py:851-955, methods.py:188-208).
    "q_feature_union" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val fu = new graft.compose.FeatureUnion(
        Seq(
          ("std", Seq("l_quantity"), cs => new StandardScaler(cs)),
          ("mm", Seq("l_quantity"), cs => new MinMaxScaler(cs))),
        weights = Map("mm" -> 2.0))
      fu.fit(li).transform(li)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("std__l_quantity"), 6).as("q_std"),
          round(col("mm__l_quantity"), 6).as("q_mm_w"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q_scaler_inverse_roundtrip" -> ((s, dir) => {
      val cols = Seq("l_quantity", "l_extendedprice")
      val li = Tables.lineitem(s, dir)
      val m = new StandardScaler(cols).fit(li)
      m.inverseTransform(m.transform(li))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 6).as("qty_rt"),
          round(col("l_extendedprice"), 6).as("price_rt"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // VarianceThreshold selector: one aggregate row of per-column
    // population variances; kept = strictly greater (sklearn).
    "q_variance_threshold" -> ((s, dir) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val m = new VarianceThreshold(cols, threshold = 1.0)
        .fit(Tables.lineitem(s, dir))
      import s.implicits._
      m.variances.map { case (c, v) => (c,
          BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          m.kept.contains(c))
        }.toDF("feature", "variance", "kept").orderBy("feature")
    }),

    // Out-of-fold smoothed target encoding + frequency encoding
    // (TargetEncoder.scala): md5-fold assignment, one (cat, fold)
    // aggregate, broadcast join back — the high-cardinality-categorical
    // scale path one-hot can't take. Verified per-row.
    "q_target_encoder" -> ((s, dir) =>
      TargetEncoder.encode(Tables.customer(s, dir),
        "c_mktsegment", "c_acctbal", "c_custkey",
        nFolds = 4, smoothing = 20.0, salt = "te")
        .select(col("c_custkey"), col("c_mktsegment"),
          col("c_mktsegment_te"), col("c_mktsegment_freq"))
        .orderBy("c_custkey"))
  )

  /** Shared contingency + margins + scores SQL for the feature-selection
    * gates (bin expressions mirror the Spark Columns exactly: floor
    * before the int cast — DuckDB's double→int cast rounds where
    * Spark's truncates). */
  private val fsScoreSql =
    """raw AS (SELECT f, bin, label, CAST(count(*) AS BIGINT) AS n_xy
      |  FROM (
      |    SELECT 'ship_year' AS f,
      |      CAST(year(l_shipdate) AS VARCHAR) AS bin,
      |      l_returnflag AS label FROM lineitem
      |    UNION ALL
      |    SELECT 'quantity_bucket',
      |      CAST(CAST(floor(l_quantity / 10) AS INT) AS VARCHAR),
      |      l_returnflag FROM lineitem
      |    UNION ALL
      |    SELECT 'discount_pct',
      |      CAST(CAST(round(l_discount * 100) AS INT) AS VARCHAR),
      |      l_returnflag FROM lineitem)
      |  GROUP BY 1, 2, 3),
      |rowm AS (SELECT f, bin, CAST(sum(n_xy) AS BIGINT) AS n_x
      |  FROM raw GROUP BY 1, 2),
      |colm AS (SELECT f, label, CAST(sum(n_xy) AS BIGINT) AS n_y
      |  FROM raw GROUP BY 1, 2),
      |tot AS (SELECT f, CAST(sum(n_xy) AS BIGINT) AS n FROM raw GROUP BY 1),
      |j AS (SELECT r.f, r.bin, r.label, r.n_xy, rm.n_x, cm.n_y, t.n
      |  FROM raw r
      |  JOIN rowm rm ON r.f = rm.f AND r.bin = rm.bin
      |  JOIN colm cm ON r.f = cm.f AND r.label = cm.label
      |  JOIN tot t ON r.f = t.f),
      |sc AS (SELECT f AS feature,
      |    CAST(count(DISTINCT bin) AS BIGINT) AS n_bins,
      |    CAST(count(DISTINCT label) AS BIGINT) AS n_classes,
      |    round(sum((CAST(n_xy AS DOUBLE) / n)
      |      * ln(CAST(n_xy AS DOUBLE) * n
      |          / (CAST(n_x AS DOUBLE) * n_y))), 6) AS mi,
      |    round(sum(power(n_xy - CAST(n_x AS DOUBLE) * n_y / n, 2)
      |        / (CAST(n_x AS DOUBLE) * n_y / n))
      |      - sum(CAST(n_x AS DOUBLE) * n_y / n) + min(n), 6) AS chi2,
      |    CAST((count(DISTINCT bin) - 1) * (count(DISTINCT label) - 1)
      |      AS BIGINT) AS dof
      |  FROM j GROUP BY f)""".stripMargin

  /** Generated round-by-round replay of the GBT fit: each round's CTEs
    * recompute the per-feature prefix gains from the integer residual
    * mass (1e6·sy − n·f), pick the argmax with the (gain DESC, feature
    * position, threshold) tiebreak, and advance the cell scores by the
    * rounded micro-unit deltas — mirroring Boosting.fitBinned exactly. */
  private val gbtOracleCtes: String = {
    val binsSrc = "SELECT CAST(year(l_shipdate) AS INT) AS b1, " +
      "CAST(floor(l_quantity / 10) AS INT) AS b2, " +
      "CAST(round(l_discount * 100) AS INT) AS b3, " +
      "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y FROM lineitem"
    val sb = new StringBuilder
    sb ++= s"""cells0 AS (SELECT b1, b2, b3, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(y) AS BIGINT) AS sy, CAST(0 AS BIGINT) AS f
      |  FROM ($binsSrc) GROUP BY 1, 2, 3)""".stripMargin
    for (t <- 1 to 3) {
      val c = s"cells${t - 1}"
      sb ++= s""",
        |r${t}s AS (SELECT fi, bin, CAST(sum(r) AS BIGINT) AS S,
        |    CAST(sum(n) AS BIGINT) AS N
        |  FROM (
        |    SELECT 0 AS fi, b1 AS bin, 1000000 * sy - n * f AS r, n FROM $c
        |    UNION ALL
        |    SELECT 1, b2, 1000000 * sy - n * f, n FROM $c
        |    UNION ALL
        |    SELECT 2, b3, 1000000 * sy - n * f, n FROM $c)
        |  GROUP BY 1, 2),
        |r${t}t AS (SELECT CAST(sum(1000000 * sy - n * f) AS BIGINT) AS St,
        |    CAST(sum(n) AS BIGINT) AS Nt FROM $c),
        |r${t}p AS (SELECT a.fi, a.bin AS thr, CAST(sum(b.S) AS BIGINT) AS SL,
        |    CAST(sum(b.N) AS BIGINT) AS NL
        |  FROM r${t}s a JOIN r${t}s b ON a.fi = b.fi AND b.bin <= a.bin
        |  GROUP BY 1, 2),
        |r${t}b AS (SELECT fi, thr,
        |    round(power(SL / 1000000.0, 2) / NL
        |      + power((St - SL) / 1000000.0, 2) / (Nt - NL)
        |      - power(St / 1000000.0, 2) / Nt, 6) AS gain,
        |    CAST(round(0.5 * SL / NL) AS BIGINT) AS ld,
        |    CAST(round(0.5 * (St - SL) / (Nt - NL)) AS BIGINT) AS rd
        |  FROM r${t}p CROSS JOIN r${t}t WHERE NL < Nt
        |  ORDER BY gain DESC, fi, thr LIMIT 1),
        |cells$t AS (SELECT c.b1, c.b2, c.b3, c.n, c.sy,
        |    c.f + CASE WHEN (CASE d.fi WHEN 0 THEN c.b1 WHEN 1 THEN c.b2
        |        ELSE c.b3 END) <= d.thr THEN d.ld ELSE d.rd END AS f
        |  FROM $c c CROSS JOIN r${t}b d)""".stripMargin
    }
    sb.toString
  }

  private val gbtFeatName = "CASE fi WHEN 0 THEN 'ship_year' " +
    "WHEN 1 THEN 'quantity_bucket' ELSE 'discount_pct' END"

  def oracles: Map[String, String] = Map(
    "q_gbt_trajectory" ->
      s"""WITH $gbtOracleCtes
         |SELECT * FROM (
         |  SELECT 1 AS round, $gbtFeatName AS feature,
         |    thr AS threshold, gain, ld AS left_micro, rd AS right_micro
         |  FROM r1b
         |  UNION ALL
         |  SELECT 2, $gbtFeatName, thr, gain, ld, rd FROM r2b
         |  UNION ALL
         |  SELECT 3, $gbtFeatName, thr, gain, ld, rd FROM r3b)
         |ORDER BY round""".stripMargin,
    "q_gbt_cells" ->
      s"""WITH $gbtOracleCtes
         |SELECT b1 AS ship_year, b2 AS quantity_bucket,
         |  b3 AS discount_pct, n, sy, f AS f_micro
         |FROM cells3 ORDER BY 1, 2, 3""".stripMargin,
    "q_decision_stump" ->
      """WITH hist AS (SELECT f, bin, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS pos
        |  FROM (
        |    SELECT 'ship_year' AS f, CAST(year(l_shipdate) AS INT) AS bin,
        |      CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |    FROM lineitem
        |    UNION ALL
        |    SELECT 'quantity_bucket', CAST(floor(l_quantity / 10) AS INT),
        |      CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
        |    FROM lineitem
        |    UNION ALL
        |    SELECT 'discount_pct', CAST(round(l_discount * 100) AS INT),
        |      CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
        |    FROM lineitem)
        |  GROUP BY 1, 2),
        |tot AS (SELECT f, CAST(sum(n) AS BIGINT) AS nt,
        |    CAST(sum(pos) AS BIGINT) AS pt FROM hist GROUP BY 1),
        |lft AS (SELECT a.f, a.bin AS threshold,
        |    CAST(sum(b.n) AS BIGINT) AS nl,
        |    CAST(sum(b.pos) AS BIGINT) AS pl
        |  FROM hist a JOIN hist b ON a.f = b.f AND b.bin <= a.bin
        |  GROUP BY 1, 2),
        |sc AS (SELECT l.f AS feature, l.threshold, l.nl,
        |    t.nt - l.nl AS nr,
        |    round(1.0 - power(CAST(t.pt AS DOUBLE) / t.nt, 2)
        |      - power(CAST(t.nt - t.pt AS DOUBLE) / t.nt, 2), 6)
        |      AS parent_gini,
        |    round((1.0 - power(CAST(t.pt AS DOUBLE) / t.nt, 2)
        |        - power(CAST(t.nt - t.pt AS DOUBLE) / t.nt, 2))
        |      - ((CAST(l.nl AS DOUBLE) / t.nt)
        |          * (1.0 - power(CAST(l.pl AS DOUBLE) / l.nl, 2)
        |            - power(CAST(l.nl - l.pl AS DOUBLE) / l.nl, 2))
        |        + (CAST(t.nt - l.nl AS DOUBLE) / t.nt)
        |          * (1.0 - power(CAST(t.pt - l.pl AS DOUBLE)
        |              / (t.nt - l.nl), 2)
        |            - power(CAST((t.nt - l.nl) - (t.pt - l.pl) AS DOUBLE)
        |              / (t.nt - l.nl), 2))), 6) AS gini_decrease
        |  FROM lft l JOIN tot t ON l.f = t.f WHERE l.nl < t.nt),
        |best AS (SELECT feature, max(gini_decrease) AS gini_decrease
        |  FROM sc GROUP BY 1),
        |bt AS (SELECT s.feature, s.gini_decrease,
        |    min(s.threshold) AS threshold
        |  FROM sc s JOIN best b ON s.feature = b.feature
        |    AND s.gini_decrease = b.gini_decrease
        |  GROUP BY 1, 2)
        |SELECT s.feature, s.threshold, s.nl AS n_left, s.nr AS n_right,
        |  s.parent_gini, s.gini_decrease
        |FROM sc s JOIN bt ON s.feature = bt.feature
        |  AND s.gini_decrease = bt.gini_decrease
        |  AND s.threshold = bt.threshold
        |ORDER BY s.feature""".stripMargin,
    "q_feature_selection" ->
      s"""WITH $fsScoreSql
         |SELECT * FROM sc ORDER BY feature""".stripMargin,
    "q_select_kbest" ->
      s"""WITH $fsScoreSql
         |SELECT * FROM sc ORDER BY mi DESC, feature LIMIT 2""".stripMargin,
    "q_mrmr_select" ->
      s"""WITH $fsScoreSql,
         |pmraw AS (SELECT p, ba, bb, CAST(count(*) AS BIGINT) AS n_xy
         |  FROM (
         |    SELECT 'ship_year|quantity_bucket' AS p,
         |      CAST(year(l_shipdate) AS VARCHAR) AS ba,
         |      CAST(CAST(floor(l_quantity / 10) AS INT) AS VARCHAR) AS bb
         |    FROM lineitem
         |    UNION ALL
         |    SELECT 'ship_year|discount_pct',
         |      CAST(year(l_shipdate) AS VARCHAR),
         |      CAST(CAST(round(l_discount * 100) AS INT) AS VARCHAR)
         |    FROM lineitem
         |    UNION ALL
         |    SELECT 'quantity_bucket|discount_pct',
         |      CAST(CAST(floor(l_quantity / 10) AS INT) AS VARCHAR),
         |      CAST(CAST(round(l_discount * 100) AS INT) AS VARCHAR)
         |    FROM lineitem)
         |  GROUP BY 1, 2, 3),
         |pmrow AS (SELECT p, ba, CAST(sum(n_xy) AS BIGINT) AS n_x
         |  FROM pmraw GROUP BY 1, 2),
         |pmcol AS (SELECT p, bb, CAST(sum(n_xy) AS BIGINT) AS n_y
         |  FROM pmraw GROUP BY 1, 2),
         |pmtot AS (SELECT p, CAST(sum(n_xy) AS BIGINT) AS n
         |  FROM pmraw GROUP BY 1),
         |pm AS (SELECT j.p,
         |    round(sum((CAST(n_xy AS DOUBLE) / n)
         |      * ln(CAST(n_xy AS DOUBLE) * n
         |          / (CAST(n_x AS DOUBLE) * n_y))), 6) AS mi
         |  FROM (SELECT r.p, r.n_xy, rm.n_x, cm.n_y, t.n FROM pmraw r
         |    JOIN pmrow rm ON r.p = rm.p AND r.ba = rm.ba
         |    JOIN pmcol cm ON r.p = cm.p AND r.bb = cm.bb
         |    JOIN pmtot t ON r.p = t.p) j
         |  GROUP BY j.p),
         |redd AS (SELECT string_split(p, '|')[1] AS f,
         |    string_split(p, '|')[2] AS g, mi FROM pm
         |  UNION ALL SELECT string_split(p, '|')[2],
         |    string_split(p, '|')[1], mi FROM pm),
         |rel AS (SELECT feature, mi FROM sc),
         |r1 AS (SELECT feature, mi AS score FROM rel
         |  ORDER BY mi DESC, feature LIMIT 1),
         |c2 AS (SELECT rel.feature, round(rel.mi - rd.mi, 6) AS score
         |  FROM rel, r1, redd rd
         |  WHERE rel.feature <> r1.feature
         |    AND rd.f = rel.feature AND rd.g = r1.feature),
         |r2 AS (SELECT feature, score FROM c2
         |  ORDER BY score DESC, feature LIMIT 1),
         |c3 AS (SELECT rel.feature,
         |    round(rel.mi - (rda.mi + rdb.mi) / 2, 6) AS score
         |  FROM rel, r1, r2, redd rda, redd rdb
         |  WHERE rel.feature <> r1.feature AND rel.feature <> r2.feature
         |    AND rda.f = rel.feature AND rda.g = r1.feature
         |    AND rdb.f = rel.feature AND rdb.g = r2.feature),
         |r3 AS (SELECT feature, score FROM c3
         |  ORDER BY score DESC, feature LIMIT 1)
         |SELECT * FROM (
         |  SELECT 1 AS rnk, feature, score FROM r1
         |  UNION ALL SELECT 2, feature, score FROM r2
         |  UNION ALL SELECT 3, feature, score FROM r3)
         |ORDER BY rnk""".stripMargin,
    "q_variance_threshold" ->
      """SELECT * FROM (
        |  SELECT 'l_quantity' AS feature, round(var_pop(l_quantity), 6) AS variance,
        |    var_pop(l_quantity) > 1.0 AS kept FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', round(var_pop(l_extendedprice), 6),
        |    var_pop(l_extendedprice) > 1.0 FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', round(var_pop(l_discount), 6),
        |    var_pop(l_discount) > 1.0 FROM lineitem
        |  UNION ALL
        |  SELECT 'l_tax', round(var_pop(l_tax), 6),
        |    var_pop(l_tax) > 1.0 FROM lineitem
        |) ORDER BY feature""".stripMargin,
    "q_target_encoder" ->
      """WITH f AS (SELECT c_custkey, c_mktsegment, c_acctbal,
        |    (('0x' || substr(md5('te' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
        |     % 4) AS fold
        |  FROM customer),
        |pf AS (SELECT c_mktsegment, fold, sum(c_acctbal) AS s, count(*) AS c
        |  FROM f GROUP BY 1, 2),
        |pc AS (SELECT c_mktsegment, sum(s) AS cat_s, sum(c) AS cat_c
        |  FROM pf GROUP BY 1),
        |tot AS (SELECT sum(s) AS tot_s, sum(c) AS tot_c FROM pf)
        |SELECT f.c_custkey, f.c_mktsegment,
        |  round((pc.cat_s - pf.s + 20.0 * tot.tot_s / tot.tot_c)
        |    / (pc.cat_c - pf.c + 20.0), 6) AS c_mktsegment_te,
        |  round(CAST(pc.cat_c AS DOUBLE) / tot.tot_c, 6) AS c_mktsegment_freq
        |FROM f
        |JOIN pf ON f.c_mktsegment = pf.c_mktsegment AND f.fold = pf.fold
        |JOIN pc ON f.c_mktsegment = pc.c_mktsegment
        |CROSS JOIN tot
        |ORDER BY f.c_custkey""".stripMargin,
    "q_standard_scaler_fit" ->
      """SELECT * FROM (
        |  SELECT 'l_quantity' AS feature, round(avg(l_quantity),6) AS mean,
        |    round(stddev_pop(l_quantity),6) AS std FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', round(avg(l_extendedprice),6),
        |    round(stddev_pop(l_extendedprice),6) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', round(avg(l_discount),6),
        |    round(stddev_pop(l_discount),6) FROM lineitem
        |) ORDER BY feature""".stripMargin,
    "q_standard_scaler_transform" ->
      """SELECT l_orderkey, l_linenumber,
        | round((l_quantity - avg(l_quantity) OVER ())
        |   / stddev_pop(l_quantity) OVER (), 6) AS scaled_qty,
        | round((l_extendedprice - avg(l_extendedprice) OVER ())
        |   / stddev_pop(l_extendedprice) OVER (), 6) AS scaled_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_column_transformer" ->
      """SELECT l_orderkey, l_linenumber,
        | round((l_quantity - avg(l_quantity) OVER ())
        |   / stddev_pop(l_quantity) OVER (), 6) AS q_std,
        | round((l_discount - min(l_discount) OVER ())
        |   / (max(l_discount) OVER () - min(l_discount) OVER ()), 6) AS d_mm
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_column_transformer_spec" ->
      """SELECT l_orderkey, l_linenumber,
        | round((l_quantity - avg(l_quantity) OVER ())
        |   / stddev_pop(l_quantity) OVER (), 6) AS q_std,
        | l_tax
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_minmax_scaler_transform" ->
      """SELECT l_orderkey, l_linenumber,
        | round((l_quantity - min(l_quantity) OVER ())
        |   / (max(l_quantity) OVER () - min(l_quantity) OVER ()), 6) AS mm_qty,
        | round((l_extendedprice - min(l_extendedprice) OVER ())
        |   / (max(l_extendedprice) OVER () - min(l_extendedprice) OVER ()), 6) AS mm_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_robust_scaler_fit" ->
      """SELECT * FROM (
        |  SELECT 'l_quantity' AS feature, round(quantile_cont(l_quantity,0.5),6) AS center,
        |    round(quantile_cont(l_quantity,0.75)-quantile_cont(l_quantity,0.25),6) AS iqr
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', round(quantile_cont(l_extendedprice,0.5),6),
        |    round(quantile_cont(l_extendedprice,0.75)-quantile_cont(l_extendedprice,0.25),6)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_tax', round(quantile_cont(l_tax,0.5),6),
        |    round(quantile_cont(l_tax,0.75)-quantile_cont(l_tax,0.25),6)
        |  FROM lineitem
        |) ORDER BY feature""".stripMargin,
    "q_simple_imputer_mean" ->
      """SELECT l_orderkey, l_linenumber,
        | round(coalesce(nullif(l_tax, 0),
        |   (SELECT avg(nullif(l_tax, 0)) FROM lineitem)), 6) AS tax_imputed
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_simple_imputer_mode" ->
      """WITH t AS (SELECT nullif(l_returnflag, 'N') AS flag FROM lineitem),
        | m AS (SELECT flag FROM t WHERE flag IS NOT NULL
        |   GROUP BY flag ORDER BY count(*) DESC, flag ASC LIMIT 1)
        |SELECT coalesce(t.flag, (SELECT flag FROM m)) AS flag, count(*) AS cnt
        |FROM t GROUP BY 1 ORDER BY flag""".stripMargin,
    "q_label_encoder" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        | dense_rank() OVER (ORDER BY l_returnflag) - 1 AS flag_code
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_ordinal_encoder" ->
      """SELECT l_orderkey, l_linenumber,
        | dense_rank() OVER (ORDER BY l_returnflag) - 1 AS flag_code,
        | dense_rank() OVER (ORDER BY l_linestatus) - 1 AS status_code
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_dummy_encoder" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(l_returnflag = 'A' AS INT) AS flag_a,
        | CAST(l_returnflag = 'N' AS INT) AS flag_n,
        | CAST(l_returnflag = 'R' AS INT) AS flag_r
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_poly_features" ->
      """SELECT l_orderkey, l_linenumber,
        | round(l_quantity, 6) AS x1, round(l_discount, 6) AS x2,
        | round(l_quantity * l_quantity, 6) AS x1_sq,
        | round(l_quantity * l_discount, 6) AS x1x2,
        | round(l_discount * l_discount, 6) AS x2_sq
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // Mirrors QuantileTransformerModel.interpTwoSided bit-for-bit:
    // fwd = np.interp(x, qs, refs); bwdi = np.interp(-x, -rev qs,
    // rev(1-refs)); u = 0.5*(fwd + 1 - bwdi). cle/clt = counts of
    // quantile-table entries <= x / < x locate the bracketing knots.
    "q_quantile_transform" ->
      """WITH qt AS (SELECT quantile_cont(l_extendedprice,
        |    list_transform(range(0, 200), i -> i/199.0)) AS qs FROM lineitem),
        |f AS (SELECT l_orderkey, l_linenumber, l_extendedprice AS x, qs,
        |    len(list_filter(qs, v -> v <= l_extendedprice)) AS cle,
        |    len(list_filter(qs, v -> v < l_extendedprice)) AS clt
        |  FROM lineitem, qt),
        |g AS (SELECT l_orderkey, l_linenumber,
        |  CASE WHEN x <= qs[1] THEN 0.0 WHEN x >= qs[200] THEN 1.0
        |    ELSE (cle-1)/199.0 + (cle/199.0 - (cle-1)/199.0)
        |      * (x - qs[cle]) / (qs[cle+1] - qs[cle]) END AS fwd,
        |  CASE WHEN x <= qs[1] THEN 1.0 WHEN x >= qs[200] THEN 0.0
        |    ELSE (1.0 - clt/199.0)
        |      + ((1.0 - (clt-1)/199.0) - (1.0 - clt/199.0))
        |      * (qs[clt+1] - x) / (qs[clt+1] - qs[clt]) END AS bwdi
        |  FROM f)
        |SELECT l_orderkey, l_linenumber,
        | round(0.5 * (fwd + (1.0 - bwdi)), 6) AS q_uniform
        |FROM g ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_pipeline" ->
      """WITH s AS (SELECT avg(l_quantity) AS m, stddev_pop(l_quantity) AS sd
        |  FROM lineitem),
        |z AS (SELECT l_orderkey, l_linenumber, (l_quantity - m)/sd AS z
        |  FROM lineitem, s),
        |mm AS (SELECT min(z) AS zmin, max(z) AS zmax FROM z)
        |SELECT l_orderkey, l_linenumber,
        | round((z - zmin)/(zmax - zmin), 6) AS scaled
        |FROM z, mm ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // + 0.0 on q_std guards DuckDB's IEEE -0.0 from round() near zero
    "q_feature_union" ->
      """SELECT l_orderkey, l_linenumber,
        | round((l_quantity - avg(l_quantity) OVER ())
        |   / stddev_pop(l_quantity) OVER (), 6) + 0.0 AS q_std,
        | round((l_quantity - min(l_quantity) OVER ())
        |   / (max(l_quantity) OVER () - min(l_quantity) OVER ()) * 2.0, 6) AS q_mm_w
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_scaler_inverse_roundtrip" ->
      """SELECT l_orderkey, l_linenumber,
        | round(l_quantity, 6) AS qty_rt,
        | round(l_extendedprice, 6) AS price_rt
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
