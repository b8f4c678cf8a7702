package graft

import org.apache.spark.sql.Column

/** Cross-engine determinism helpers (SURVEY.md §2.0 rules D1–D8).
  *
  * Every oracle-declared query routes money math through fixed-scale decimals
  * (D2: double aggregation is order-dependent and flakes between engines) and
  * emits dates as `DATE` (D3). Scale is never reduced on the final cast —
  * decimal rescale rounding (HALF_UP vs others) is exactly the kind of
  * divergence these helpers exist to prevent.
  */
object Det {
  /** Quantize to DECIMAL(18,2) BEFORE aggregation (sums stay exact). */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** DECIMAL(18,4) for products like price*(1-discount). */
  def dec4(c: Column): Column = c.cast("decimal(18,4)")

  /** Final-output cast: fixes precision without changing scale (exact). */
  def out2(c: Column): Column = c.cast("decimal(18,2)")
  def out4(c: Column): Column = c.cast("decimal(18,4)")

  /** Timestamp-to-date emission (rule D3). */
  def asDate(c: Column): Column = c.cast("date")
}
