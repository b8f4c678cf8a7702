package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

/** Optimizer rule: rewrite `year(col) = <year literal>` into a half-open
  * range predicate on `col`.
  *
  * `year()` is opaque to data-source pushdown, so the filter otherwise runs
  * only after the scan; the equivalent range comparison reaches the Parquet
  * reader (row-group statistics pruning) — the difference between scanning a
  * year and scanning everything at 100 TB. Null semantics are preserved
  * (both forms evaluate to null on null input), and with the session pinned
  * to UTC the boundary instants are identical for DATE, TIMESTAMP and
  * TIMESTAMP_NTZ columns.
  *
  * Installed at runtime via `spark.experimental.extraOptimizations` (the
  * driver owns session construction, so the SparkSessionExtensions route is
  * not available here).
  */
object YearEqualsToRange extends Rule[LogicalPlan] {

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case eq @ EqualTo(Year(child), Literal(y: Int, _)) =>
      target(child).map(range(_, y)).getOrElse(eq)
    case eq @ EqualTo(Literal(y: Int, _), Year(child)) =>
      target(child).map(range(_, y)).getOrElse(eq)
  }

  /** The analyzer wraps year(ts) as year(cast(ts as date)); range the
    * UNDERLYING column so the predicate can reach the scan (a comparison on
    * a cast does not push down). Year boundaries are the same instants
    * either way under the UTC session.
    */
  private def target(child: Expression): Option[Expression] = child match {
    case Cast(inner, DateType, _, _) if supported(inner) => Some(inner)
    case e if supported(e) => Some(e)
    case _ => None
  }

  private def supported(child: Expression): Boolean = child.dataType match {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Bounds are emitted as ALREADY-FOLDED typed literals: this rule runs in
    * the user-provided batch after ConstantFolding, and the data-source
    * filter translator only recognizes bare literals (a Cast(Literal) would
    * keep the predicate off the scan).
    */
  private def range(child: Expression, y: Int): Expression = {
    def bound(year: Int): Literal = {
      val days = java.time.LocalDate.of(year, 1, 1).toEpochDay
      child.dataType match {
        case DateType => Literal(days.toInt, DateType)
        case TimestampType => Literal(days * 86400L * 1000000L, TimestampType)
        case _ => Literal(days * 86400L * 1000000L, TimestampNTZType)
      }
    }
    And(GreaterThanOrEqual(child, bound(y)), LessThan(child, bound(y + 1)))
  }

  /** Idempotent install into a live session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    }
}
