package graft

import org.apache.spark.sql.Column

/** Cross-engine determinism helpers (SURVEY.md §2.0 rules D1–D8).
  *
  * Every oracle-declared query routes money math through fixed-scale decimals
  * (D2: double aggregation is order-dependent and flakes between engines) and
  * emits dates as `DATE` (D3).
  *
  * OUTPUT columns are emitted as DOUBLE, not DECIMAL: the exact decimal
  * aggregate is final-cast to double on BOTH engine sides, so both convert
  * the same exact value to the same nearest double and any downstream repr
  * normalization (`253942.00` vs `253942.0`) is moot. The math stays decimal
  * end-to-end; only the last cast changes the wire type.
  */
object Det {
  /** Quantize to DECIMAL(18,2) BEFORE aggregation (sums stay exact). */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** DECIMAL(18,4) for products like price*(1-discount). */
  def dec4(c: Column): Column = c.cast("decimal(18,4)")

  /** Final-output cast: quantize exactly, then emit as DOUBLE (see above).
    * NEVER use these on a column that feeds further aggregation — keep those
    * decimal and out-cast only at the final select.
    */
  def out2(c: Column): Column = c.cast("decimal(18,2)").cast("double")
  def out4(c: Column): Column = c.cast("decimal(18,4)").cast("double")

  /** Timestamp-to-date emission (rule D3). */
  def asDate(c: Column): Column = c.cast("date")

  /** `round(c, 4)` with results BIT-IDENTICAL to Spark's builtin (the
    * BigDecimal shortest-repr HALF_UP path every oracle-passed query was
    * validated against) but ~7× cheaper on the hot path: Spark's
    * `round(DOUBLE, 4)` allocates a BigDecimal per value (measured 0.65 s
    * for 5 rounds × 600k rows, `ProbeScan`), while pure float math costs
    * nothing — so float math decides whenever the scaled value is PROVABLY
    * far from a .5 rounding boundary and the builtin handles the rest:
    *
    *  - `w = |c|·10⁴` carries ≤ 1 ulp of multiply error plus ≤ ½ ulp of
    *    shortest-repr distance (the builtin rounds the shortest decimal
    *    repr of c, not its exact binary expansion) — combined < w·10⁻¹⁵;
    *  - if `|frac(w) − 0.5| > max(w,1)·10⁻¹²` (a 1000× margin), the exact
    *    decimal and w lie on the SAME side of the boundary, so
    *    `floor(w+0.5)` equals the builtin's HALF_UP integer and the final
    *    `k/10⁴` division is correctly rounded to the same double;
    *  - near-boundary values (~1 in 10⁷ of uniform data), non-finite, and
    *    |c| ≥ 10¹² (long-floor range) fall back to the builtin.
    *
    * The trailing `+ 0.0` mirrors the builtin's sign behavior (BigDecimal
    * never emits -0.0; `signum` would). PropertySpec fuzzes equality on
    * random magnitudes and adversarial boundary/±0/NaN/∞ values.
    */
  def round4fast(c: Column): Column = {
    import org.apache.spark.sql.functions._
    val w = abs(c) * lit(1e4)
    val fr = w - floor(w).cast("double")
    val far = abs(fr - lit(0.5)) > greatest(w, lit(1.0)) * lit(1e-12)
    val safe = !isnan(c) && abs(c) < lit(1e12) && far
    val fast = floor(w + lit(0.5)).cast("double") / lit(1e4) * signum(c) + lit(0.0)
    when(safe, fast).otherwise(round(c, 4))
  }

  /** Round to 4 dp and normalize negative zero (D4): DuckDB's ROUND keeps
    * the sign of -0.0, Spark's does not, and '-0.0' != '0.0' under any
    * repr-based compare. IEEE -0.0 + 0.0 = 0.0 on both engines, so every
    * rounded output whose domain crosses zero adds + 0.0 on BOTH sides.
    */
  def round4nz(c: Column): Column =
    round4fast(c) + org.apache.spark.sql.functions.lit(0.0)
}
