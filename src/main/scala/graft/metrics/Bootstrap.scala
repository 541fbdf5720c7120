package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson-bootstrap confidence intervals for grouped corpus metrics —
  * error bars at 100 TB without ever materializing a resample.
  *
  * The classical bootstrap resamples n rows with replacement B times —
  * a non-starter distributed (B shuffled copies). The Poisson
  * bootstrap (Hanley & MacGibbon 2006; the streaming/sharded form
  * used in large-scale A/B pipelines) replaces each replica's
  * multinomial row counts with independent Poisson(1) weights, which
  * factor per row: every (row, replica) weight is a pure function of
  * the row id — here the house md5-60-bit hash pushed through the
  * EXACT integer inverse-CDF of Poisson(1) (thresholds floor(CDF_k ·
  * 2^60), embedded as the same literals in the plan and the generated
  * SQL mirror, so both engines draw identical weights with no
  * floating-point sampling anywhere).
  *
  * Scale shape: ONE pass — explode each row into its B (replica,
  * weight) pairs and aggregate weighted sums per (group, replica)
  * with map-side partials; B is a small constant (50), so the shuffle
  * carries ≤ B·|groups| keys. The CI is then a percentile over each
  * group's B replica means (a |groups|·B-row aggregate). Replica
  * means are rounded to 6 at the handoff (the cross-engine
  * determinism convention).
  */
object Bootstrap {

  /** floor(CDF_Poisson(1)(k) · 2^60) for k = 0..11 — P(K > 11) <
    * 1e-9, so the tail clamp at 12 is unreachable for any practical
    * hash draw.
    */
  private[metrics] val thresholds: Seq[Long] = {
    val twoTo60 = math.pow(2.0, 60)
    var pk = math.exp(-1.0)
    var cum = 0.0
    (0 to 11).map { k =>
      cum += pk
      pk = pk / (k + 1)
      (cum * twoTo60).toLong
    }
  }

  /** Poisson(1) weight for (id, replica): the 60-bit hash of
    * "salt|id#replica" inverse-CDF'd through the integer thresholds.
    */
  def poissonWeight(id: Column, replica: Column, salt: String): Column = {
    val h = graft.core.Hashing.h60(
      concat(id.cast("string"), lit("#"), replica.cast("string")), salt)
    thresholds.zipWithIndex.foldRight(lit(12): Column) {
      case ((t, k), elseC) => when(h < t, lit(k)).otherwise(elseC)
    }
  }

  /** The same draw as SQL, generated from the same threshold list. */
  def poissonWeightSql(idExpr: String, replicaExpr: String,
      salt: String): String = {
    val h = s"(('0x' || substr(md5('$salt' || CAST($idExpr AS VARCHAR) " +
      s"|| '#' || CAST($replicaExpr AS VARCHAR)), 1, 15))::BIGINT)"
    thresholds.zipWithIndex.reverse.foldLeft("12") {
      case (elseC, (t, k)) => s"CASE WHEN $h < $t THEN $k ELSE $elseC END"
    }
  }

  /** Percentile-bootstrap CI for the per-group mean of `valueCol`:
    * (group, mean, ci_lo, ci_hi, n_replicas). Replicas where a group
    * draws zero total weight yield a null mean and are excluded from
    * the percentile (n_replicas reports the survivors).
    */
  def bootstrapCI(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, b: Int = 50, lo: Double = 0.025,
      hi: Double = 0.975, salt: String = "boot"): DataFrame = {
    require(b >= 2, s"need at least 2 replicas, got $b")
    require(lo > 0 && hi < 1 && lo < hi, s"bad percentiles ($lo, $hi)")
    val exploded = df.select(col(groupCol), col(idCol),
        col(valueCol).cast("double").as("__v"),
        explode(sequence(lit(0), lit(b - 1))).as("__rep"))
      .withColumn("__w", poissonWeight(col(idCol), col("__rep"), salt))
    val replicaMeans = exploded.groupBy(col(groupCol), col("__rep"))
      .agg(round(try_divide(sum(col("__w") * col("__v")),
        sum(col("__w")).cast("double")), 6).as("__m"))
    val point = df.groupBy(col(groupCol))
      .agg(round(avg(col(valueCol).cast("double")), 6).as("mean"))
    replicaMeans.filter(col("__m").isNotNull)
      .groupBy(col(groupCol))
      .agg(round(expr(s"percentile(__m, $lo)"), 6).as("ci_lo"),
        round(expr(s"percentile(__m, $hi)"), 6).as("ci_hi"),
        count(lit(1)).as("n_replicas"))
      .join(point, Seq(groupCol))
      .select(col(groupCol), col("mean"), col("ci_lo"), col("ci_hi"),
        col("n_replicas"))
  }
}
