package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryPack, Tables}
import graft.relational.Sketches

/** Oracle-verified gates for the corpus-profiling family: HyperLogLog
  * cardinality, Count-Min frequency, Benford first-digit audit, and the
  * pre-shuffle key-skew report. Every sketch register/bucket derives
  * from the house h60 hash, so the DuckDB oracles replay the sketches
  * bit-for-bit — these are exact gates, not tolerance checks.
  */
object ProfilingQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // HyperLogLog distinct-count sketch (relational/Sketches.scala):
    // p=9 → 512 registers off ONE map-side-combinable groupBy; the gate
    // reports the estimate against the exact distinct count. The power
    // sum is an exact BIGINT, so the whole estimate replays in DuckDB.
    "q_hll_distinct" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      val est = Sketches.hllEstimate(
        Sketches.hllRegisters(orders, col("o_custkey"), "hll", p = 9), p = 9)
      val exact = orders.agg(countDistinct(col("o_custkey")).as("exact_distinct"))
      est.join(broadcast(exact))
        .select(col("m"), col("zero_registers"), col("raw_estimate"),
          col("estimate"), col("exact_distinct"),
          round(abs(col("estimate") - col("exact_distinct"))
            / col("exact_distinct"), 6).as("rel_err"))
    }),

    // Count-Min frequency sketch: depth 4 × width 4096 cells from one
    // exploded pass; probe keys (custkeys ≤ 25) estimated by the min
    // over hash rows. Integer outputs — hash-exact; the one-sided
    // guarantee (never undercount) is visible as overcount ≥ 0.
    "q_cms_counts" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      val sketch = Sketches.cmsSketch(orders, col("o_custkey"), "cms")
      val probes = orders.where(col("o_custkey") <= 25)
        .select(col("o_custkey")).distinct()
      val est = Sketches.cmsEstimate(sketch, probes, col("o_custkey"), "cms")
      val truth = orders.where(col("o_custkey") <= 25)
        .groupBy(col("o_custkey").as("key"))
        .agg(count(lit(1)).as("exact_count"))
      truth.join(est, Seq("key"))
        .select(col("key"), col("exact_count"), col("cms_count"),
          (col("cms_count") - col("exact_count")).as("overcount"))
        .orderBy("key")
    }),

    // Per-day distinct-user HLL (the grouped sketch — production's
    // "daily actives without a daily distinct shuffle"): one grouped
    // register rollup, per-day estimates vs exact.
    "q_hll_daily" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val est = Sketches.hllGroupedEstimate(
        Sketches.hllGroupedRegisters(ev, date_trunc("DAY", col("ts")),
          col("user_id"), "dhll"))
      val exact = ev.groupBy(date_trunc("DAY", col("ts")).as("g"))
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
      est.join(exact, Seq("g"))
        .select(date_format(col("g"), "yyyy-MM-dd").as("day"),
          col("zero_registers"), col("estimate"), col("exact_distinct"),
          round(abs(col("estimate") - col("exact_distinct"))
            / col("exact_distinct"), 6).as("rel_err"))
        .orderBy("day")
    }),

    // Benford first-digit conformance over order totals (quality/
    // Profiling.scala): digit shares vs log10(1+1/d) plus per-digit
    // chi-square terms — one corpus aggregate, 9-row output.
    "q_benford" -> ((s, dir) =>
      Profiling.benfordReport(Tables.orders(s, dir), col("o_totalprice"))
        .orderBy("digit")),

    // Key-skew shuffle-planning report for lineitem.l_partkey: per-key
    // counts (the only corpus pass) → one-row rollup with exact
    // percentiles over the ≤|keys| frame.
    "q_key_skew" -> ((s, dir) =>
      Profiling.keySkewReport(Tables.lineitem(s, dir), col("l_partkey")))
  )

  private val hllSql =
    """WITH h AS (SELECT CAST(('0x' || substr(md5('hll' || CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      |    FROM orders),
      |r AS (SELECT h >> 51 AS register,
      |    CASE WHEN (h & ((CAST(1 AS BIGINT) << 51) - 1)) = 0 THEN 52
      |         ELSE instr(lpad(bin(h & ((CAST(1 AS BIGINT) << 51) - 1)), 51, '0'), '1')
      |    END AS rank
      |  FROM h),
      |g AS (SELECT register, max(rank) AS rank FROM r GROUP BY 1),
      |s AS (SELECT CAST(count(*) AS BIGINT) AS nz,
      |    CAST(sum(CAST(1 AS BIGINT) << (52 - rank)) AS BIGINT) AS psum
      |  FROM g)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_hll_daily" ->
      """WITH h AS (SELECT date_trunc('day', ts) AS g,
        |    CAST(('0x' || substr(md5('dhll' || CAST(user_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) AS h
        |  FROM events),
        |r AS (SELECT g, h >> 51 AS register,
        |    CASE WHEN (h & ((CAST(1 AS BIGINT) << 51) - 1)) = 0 THEN 52
        |         ELSE instr(lpad(bin(h & ((CAST(1 AS BIGINT) << 51) - 1)),
        |           51, '0'), '1')
        |    END AS rank
        |  FROM h),
        |gr AS (SELECT g, register, max(rank) AS rank FROM r GROUP BY 1, 2),
        |s AS (SELECT g, CAST(count(*) AS BIGINT) AS nz,
        |    CAST(sum(CAST(1 AS BIGINT) << (52 - rank)) AS BIGINT) AS psum
        |  FROM gr GROUP BY 1),
        |e AS (SELECT g, CAST(512 - nz AS BIGINT) AS zero_registers,
        |    round((0.7213 / (1.0 + 1.079 / 512)) * 512.0 * 512.0
        |      * power(2.0, 52)
        |      / (psum + (512 - nz) * (CAST(1 AS BIGINT) << 52)), 6)
        |      AS raw_estimate
        |  FROM s),
        |f AS (SELECT g, zero_registers,
        |    round(CASE WHEN raw_estimate <= 1280.0 AND zero_registers > 0
        |      THEN 512.0 * ln(512.0 / zero_registers)
        |      ELSE raw_estimate END, 6) AS estimate
        |  FROM e),
        |x AS (SELECT date_trunc('day', ts) AS g,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
        |  FROM events GROUP BY 1)
        |SELECT strftime(f.g, '%Y-%m-%d') AS day, zero_registers,
        |  estimate, exact_distinct,
        |  round(abs(estimate - exact_distinct) / exact_distinct, 6)
        |    AS rel_err
        |FROM f JOIN x ON f.g = x.g ORDER BY day""".stripMargin,
    "q_hll_distinct" ->
      s"""$hllSql,
         |e AS (SELECT CAST(512 AS BIGINT) AS m,
         |    CAST(512 - nz AS BIGINT) AS zero_registers,
         |    round((0.7213 / (1.0 + 1.079 / 512)) * 512.0 * 512.0
         |      * power(2.0, 52)
         |      / (psum + (512 - nz) * (CAST(1 AS BIGINT) << 52)), 6)
         |      AS raw_estimate
         |  FROM s),
         |f AS (SELECT m, zero_registers, raw_estimate,
         |    round(CASE WHEN raw_estimate <= 1280.0 AND zero_registers > 0
         |      THEN 512.0 * ln(512.0 / zero_registers)
         |      ELSE raw_estimate END, 6) AS estimate
         |  FROM e),
         |x AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT)
         |    AS exact_distinct FROM orders)
         |SELECT m, zero_registers, raw_estimate, estimate, exact_distinct,
         |  round(abs(estimate - exact_distinct) / exact_distinct, 6)
         |    AS rel_err
         |FROM f CROSS JOIN x""".stripMargin,
    "q_cms_counts" ->
      """WITH d AS (SELECT i FROM (VALUES (0), (1), (2), (3)) t(i)),
        |cells AS (SELECT d.i AS row,
        |    CAST(('0x' || substr(md5('cms' || CAST(d.i AS VARCHAR)
        |      || CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % 4096
        |      AS bucket
        |  FROM orders CROSS JOIN d),
        |sk AS (SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt
        |  FROM cells GROUP BY 1, 2),
        |probes AS (SELECT DISTINCT o_custkey AS key FROM orders
        |  WHERE o_custkey <= 25),
        |pc AS (SELECT p.key, d.i AS row,
        |    CAST(('0x' || substr(md5('cms' || CAST(d.i AS VARCHAR)
        |      || CAST(p.key AS VARCHAR)), 1, 15)) AS BIGINT) % 4096
        |      AS bucket
        |  FROM probes p CROSS JOIN d),
        |est AS (SELECT key,
        |    CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS cms_count
        |  FROM pc LEFT JOIN sk USING (row, bucket) GROUP BY key),
        |tru AS (SELECT o_custkey AS key, CAST(count(*) AS BIGINT)
        |    AS exact_count
        |  FROM orders WHERE o_custkey <= 25 GROUP BY 1)
        |SELECT t.key, t.exact_count, e.cms_count,
        |  e.cms_count - t.exact_count AS overcount
        |FROM tru t JOIN est e USING (key) ORDER BY t.key""".stripMargin,
    "q_benford" ->
      """WITH fd AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
        |      AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders
        |  WHERE CAST(round(o_totalprice * 100) AS BIGINT) >= 1),
        |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
        |  FROM fd GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g),
        |o AS (SELECT digit, n,
        |    round(CAST(n AS DOUBLE) / total, 6) AS observed_p,
        |    round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS expected_p,
        |    total
        |  FROM g CROSS JOIN t)
        |SELECT digit, n, observed_p, expected_p,
        |  round(total * power(observed_p - expected_p, 2) / expected_p, 6)
        |    AS chi2_term
        |FROM o ORDER BY digit""".stripMargin,
    "q_key_skew" ->
      """WITH per AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(sum(cnt) AS BIGINT) AS n_rows,
        |    CAST(max(cnt) AS BIGINT) AS max_cnt,
        |    quantile_cont(cnt, 0.5) AS p50,
        |    quantile_cont(cnt, 0.9) AS p90,
        |    quantile_cont(cnt, 0.99) AS p99
        |  FROM per)
        |SELECT n_keys, n_rows, max_cnt,
        |  round(p50, 6) AS p50_cnt, round(p90, 6) AS p90_cnt,
        |  round(p99, 6) AS p99_cnt,
        |  round(CAST(max_cnt AS DOUBLE) / n_rows, 6) AS top_key_share,
        |  round(CAST(max_cnt AS DOUBLE) / p50, 6) AS skew_factor
        |FROM s""".stripMargin
  )
}
