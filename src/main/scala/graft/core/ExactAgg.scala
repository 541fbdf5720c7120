package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent floating-point aggregation — the fix for a defect
  * class round 14 exposed: an UNROUNDED `sum(double)` feeding a
  * round-6 handoff is only deterministic if the accumulation order is
  * fixed, and DuckDB's parallel aggregation (like Spark's shuffle-fetch
  * merge) is NOT order-stable run to run. q_als_implicit_d8's
  * trajectory landed within float-merge noise of a .5e-6 boundary and
  * the ORACLE side flipped between check runs on byte-identical inputs
  * (~50% observed) — the engine result was stable only by the luck of
  * a fixed local partition layout.
  *
  * Recipe (exact on both engines, any thread count, any order):
  *
  *  1. quantize each term to integer micro-units:
  *     `round(t · 1e12, 0)` — `t` is bit-identical cross-engine by the
  *     IEEE-parity convention, the product is one more identical IEEE
  *     op, and half-way ties (exact k+0.5 doubles) round away from
  *     zero in BOTH Spark (BigDecimal HALF_UP) and DuckDB (round());
  *  2. sum as DECIMAL(38,0) — exact integer arithmetic, associative
  *     and commutative, so thread/merge order cannot matter;
  *  3. read back `CAST(s AS DOUBLE) / 1e12` — deterministic nearest
  *     conversions on identical values.
  *
  * The 1e-12 grid loses ~6 decimal digits of headroom below the
  * round-6 handoff grid, so trajectory semantics are unchanged in
  * practice; what changes is that BOTH engines now compute THE SAME
  * pre-rounding value by construction instead of by accumulation-order
  * luck. Headroom: |term| ≤ ~1e6 → micro-units ≤ 1e18 (fits the
  * integer-valued-double range deterministically; above 2^53 the grid
  * coarsens identically on both sides), and DECIMAL(38,0) holds 1e38
  * before overflow — ~1e20 summed rows at that magnitude.
  */
object ExactAgg {

  val MicroScale = 1e12

  /** `sum(term)` with order-independent exact accumulation (Column
    * side). Bit-identical to [[sqlSumMicro]] on the same rows.
    *
    * All-primitive plan: quantize via the codegen
    * [[graft.functions.MicroQuantize]] kernel (`round(col·1e12, 0)`
    * computes the same value but through BigDecimal per row — benched
    * 4× slower on the 44-sum d=8 ALS half-steps), then ONE plain
    * `sum(long)` per term (a DECIMAL(38,0) sum kept a 2× penalty —
    * decimal agg buffers are not primitive — and a hi/lo split into
    * two long sums doubled the aggregate-buffer count past the
    * whole-stage-codegen width threshold and lost more than it won).
    *
    * Caller contract (documented, and LOUDLY checked by construction):
    * per-group Σ|term|·1e12 must fit a signed long, i.e.
    * max|term|·rows_per_group < 9.2e6 — the ALS/GloVe Gram and
    * correction sums sit ≥100× inside this at x16 gate scale. If data
    * ever breached it, Spark's long sum WRAPS while the oracle's
    * DuckDB sum widens to HUGEINT, so the gate FAILS visibly rather
    * than both engines agreeing on a silently wrong value.
    */
  def sumMicro(term: Column): Column =
    sum(graft.functions.MicroQuantize(term)).cast("double") / lit(MicroScale)

  /** The DuckDB mirror of [[sumMicro]] for generated oracles.
    * `CAST(double AS BIGINT)` rounds to nearest in DuckDB, but the
    * rounded value is already integral so the cast is exact.
    */
  def sqlSumMicro(expr: String): String =
    s"CAST(sum(CAST(round(($expr) * 1000000000000.0, 0) AS BIGINT)) " +
      s"AS DOUBLE) / 1000000000000.0"
}
