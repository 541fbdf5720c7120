package graft.preprocessing

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Out-of-fold target (mean) encoding + frequency encoding for
  * high-cardinality categoricals — the standard large-scale
  * alternative to one-hot (reference: dask_ml only ships
  * OneHot/Ordinal/Dummy encoders, preprocessing/data.py +
  * preprocessing/label.py; target encoding is the scale path those
  * stop short of: |categories| columns become ONE double column).
  *
  * Leakage-safe out-of-fold scheme (the sklearn `TargetEncoder` /
  * CatBoost-style CV form): every row is assigned a deterministic fold
  * by content hash of its id; the encoding a row receives is the
  * smoothed target mean of its category computed over the OTHER folds
  * only — a row never sees its own target:
  *
  *   enc(cat, f) = (sum(cat) − sum(cat, f) + m·prior) /
  *                 (cnt(cat) − cnt(cat, f) + m)
  *
  * with `prior` the global target mean and `m` the additive-smoothing
  * pseudo-count. Categories whose out-of-fold slice is empty fall back
  * to the prior (the m-weighted form already does this smoothly; a
  * fully absent oof slice with m = 0 yields null → coalesce(prior)).
  *
  * Scale shape: ONE hash aggregate over the corpus keyed by
  * (category, fold) — ≤ |cats|·k rows — then a broadcast join of that
  * tiny encoding table back onto the big side. No corpus shuffle, no
  * window over the data, map-side partial aggregation throughout; at
  * 100 TB the broadcast table is |cats|·k rows regardless of corpus
  * size. The fold hash is the repo-wide md5-60-bit convention, so a
  * SQL oracle reproduces assignments bit-for-bit.
  */
object TargetEncoder {

  /** 60-bit md5 hash of (salt ++ key) — the shared repo convention
    * ([[graft.core.Hashing.h60]]).
    */
  private def h60(key: Column, salt: String): Column =
    graft.core.Hashing.h60(key, salt)

  /** Adds `<catCol>_te` (out-of-fold smoothed target mean, rounded to 6)
    * and `<catCol>_freq` (category frequency in [0,1], rounded to 6) to
    * `df`. `idCol` drives the deterministic fold assignment.
    */
  def encode(df: DataFrame, catCol: String, targetCol: String, idCol: String,
      nFolds: Int = 4, smoothing: Double = 20.0, salt: String = "te"): DataFrame = {
    require(nFolds >= 2, s"nFolds must be >= 2, got $nFolds")
    require(smoothing >= 0, s"smoothing must be >= 0, got $smoothing")
    val fold = pmod(h60(col(idCol), salt), lit(nFolds.toLong)).as("__fold")
    val withFold = df.withColumn("__fold", fold)

    // one corpus pass: per-(category, fold) sums — tiny result
    val perFold = withFold.groupBy(col(catCol), col("__fold"))
      .agg(sum(col(targetCol).cast("double")).as("__s"),
        count(lit(1)).as("__c"))
    val perCat = perFold.groupBy(col(catCol))
      .agg(sum(col("__s")).as("__cat_s"), sum(col("__c")).as("__cat_c"))
    val tot = perFold.agg(sum(col("__s")).as("__tot_s"), sum(col("__c")).as("__tot_c"))

    // encoding table: (category, fold) → oof mean; joined to the global
    // prior via a 1-row cross (both sides are already aggregates)
    val prior = col("__tot_s") / col("__tot_c")
    val enc = perFold.join(perCat, Seq(catCol)).crossJoin(broadcast(tot))
      .select(col(catCol), col("__fold"),
        // try_divide + coalesce(prior): with smoothing = 0 a fully
        // absent oof slice is 0/0 (an ANSI-mode error under plain
        // Divide) — the documented fallback makes it the prior
        round(coalesce(
          try_divide(
            col("__cat_s") - col("__s") + lit(smoothing) * prior,
            col("__cat_c") - col("__c") + lit(smoothing)),
          prior), 6).as(s"${catCol}_te"),
        round(col("__cat_c").cast("double") / col("__tot_c"), 6).as(s"${catCol}_freq"))

    withFold.join(broadcast(enc), Seq(catCol, "__fold"))
      .drop("__fold")
  }
}
