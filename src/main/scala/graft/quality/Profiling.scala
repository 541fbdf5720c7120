package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-profiling audits that inform pipeline decisions before the
  * expensive stages run: a Benford first-digit conformance test (the
  * classic fabricated-data / unit-mixing detector for financial-style
  * amount columns — Nigrini 2012) and a join/groupBy key-skew report
  * (the pre-shuffle audit: is this key safe to hash-partition, or does
  * it need salting / AQE skew handling?).
  *
  * Scale shape: each audit is ONE corpus aggregate; everything after is
  * arithmetic over ≤ 9 rows (digits) or one row (skew rollup). The
  * Benford digit comes from the integer cents via string head — double
  * formatting and log10-at-power-of-ten boundaries never enter, so the
  * digit extraction is bit-identical in any engine.
  */
object Profiling {

  /** Per-digit Benford table for a positive amount column: observed
    * share vs log10(1 + 1/d), with the per-digit chi-square term
    * n·(obs − exp)²/exp. Rows: digit 1..9 present in the data. */
  def benfordReport(df: DataFrame, amount: Column): DataFrame = {
    // first significant digit off the integer cents — exact in both
    // engines; zero/negative/null amounts are excluded (no first digit)
    val cents = round(amount * 100).cast("long")
    val digit = substring(cents.cast("string"), 1, 1).cast("int")
    // filter on the DERIVED cents, not the raw amount: amounts in
    // (0, 0.005) pass amount > 0 but round to 0 cents, whose "digit"
    // 0 would divide expected_p by zero
    val perDigit = df.where(cents >= 1)
      .select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = perDigit.agg(sum("n").as("__total"))
    perDigit.join(broadcast(total))
      .select(col("digit"), col("n"),
        round(col("n") / col("__total"), 6).as("observed_p"),
        round(log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)), 6)
          .as("expected_p"),
        col("__total"))
      .select(col("digit"), col("n"), col("observed_p"), col("expected_p"),
        round(col("__total")
          * pow(col("observed_p") - col("expected_p"), 2)
          / col("expected_p"), 6).as("chi2_term"))
  }

  /** One-row shuffle-planning report for a candidate partition key:
    * key count, row total, the heaviest key's share, exact p50/p90/p99
    * of per-key row counts, and max/median skew factor. The per-key
    * frame is the only intermediate (≤ |keys| rows); percentiles run
    * over that frame, never the corpus. */
  def keySkewReport(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("__k")).agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_keys"),
        sum("cnt").as("n_rows"),
        max("cnt").as("max_cnt"),
        expr("percentile(cnt, 0.5)").as("__p50"),
        expr("percentile(cnt, 0.9)").as("__p90"),
        expr("percentile(cnt, 0.99)").as("__p99"))
      .select(col("n_keys"), col("n_rows"), col("max_cnt"),
        round(col("__p50"), 6).as("p50_cnt"),
        round(col("__p90"), 6).as("p90_cnt"),
        round(col("__p99"), 6).as("p99_cnt"),
        round(col("max_cnt") / col("n_rows"), 6).as("top_key_share"),
        round(col("max_cnt") / col("__p50"), 6).as("skew_factor"))
}
