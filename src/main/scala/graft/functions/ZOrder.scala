package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve value over two dimensions — the multi-dimensional
  * clustering key behind data-skipping layouts (Delta OPTIMIZE ZORDER,
  * Iceberg sort orders): sorting by the interleaved bits gives every output
  * file a SMALL RANGE IN BOTH dimensions simultaneously, so parquet
  * row-group min/max statistics prune scans filtered on EITHER column. A
  * plain 1-D sort buys pruning on one column and leaves the other's
  * per-file range at full width.
  *
  * Built from native bitwise Columns (shiftleft / & / |) — stays inside
  * whole-stage codegen, no UDF. Inputs are clamped to 16 bits here (the
  * classic bit-spreading construction; widen the magic-number ladder for
  * more); callers quantile-bucket wider domains first, which also
  * equalizes dimension weights the way production z-ordering does.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` so bit i lands at position 2i. */
  private[graft] def spread(x: Column): Column = {
    var v = x.cast("bigint").bitwiseAND(lit(0xFFFFL))
    v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
    v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x33333333L))
    v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Z-value of (a, b): a's bits at odd positions, b's at even. */
  def zValue(a: Column, b: Column): Column =
    shiftleft(spread(a), 1).bitwiseOR(spread(b))
}
