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

  /** Round to 4 dp and normalize negative zero (D4): DuckDB's ROUND keeps
    * the sign of -0.0, Spark's does not, and '-0.0' != '0.0' under any
    * repr-based compare. IEEE -0.0 + 0.0 = 0.0 on both engines, so every
    * rounded output whose domain crosses zero adds + 0.0 on BOTH sides.
    */
  def round4nz(c: Column): Column =
    org.apache.spark.sql.functions.round(c, 4) + org.apache.spark.sql.functions.lit(0.0)
}
