package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Expand, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite an inner BAND join — a join whose only usable
  * predicate is `abs(a − b) <= w` (or the paired `a - b <= w && b - a <= w`
  * form users write by hand) — into a BUCKETED equi-join, j19's manual plan
  * shape applied automatically to any user query.
  *
  * Without an equi-conjunct Spark has no hash key, so the planner's only
  * options are broadcast-nested-loop or a cartesian product: O(n·m)
  * predicate evaluations, and the broadcast side cannot be corpus-sized.
  * The rewrite quantizes the band axis into width-w integer buckets
  * (`floor(x ∕ w)`), EXPANDs the left side to its own bucket ±1 — any
  * in-band partner provably lands in one of the three — adds the bucket
  * equality as a new equi-conjunct, and keeps the ORIGINAL predicate as the
  * residual. Each qualifying pair survives exactly once: the right row's
  * bucket is a function of its own value, so exactly one of the left row's
  * three bucket copies can equal it. Cost: one keyed shuffle of 3n + m rows
  * on a dense integer key — broadcast-free, skew-safe, linear.
  *
  * Fire conditions (all checked, otherwise the join is left untouched):
  *  - inner join, condition present;
  *  - some conjunct is a band predicate `abs(l − r) <= w` with `l` referring
  *    only to the left side, `r` only to the right (either orientation),
  *    both DOUBLE, and `w` a positive foldable literal;
  *  - no conjunct is already an equi-predicate across the two sides (if one
  *    exists the planner already has a hash key and the expansion would
  *    only triple the probe side).
  *
  * Null semantics are preserved: a null band operand makes the original
  * predicate null (row dropped by the inner join) and makes the synthesized
  * bucket null (row dropped by the added equality) — same result.
  *
  * Installed via [[GraftExtensions]] (config-time) or `install(spark)`
  * (runtime, `spark.experimental.extraOptimizations`).
  */
object BandJoinToBucket extends Rule[LogicalPlan] {

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjuncts(cond)
      if (hasEquiConjunct(conjuncts, left, right)) j
      else findBand(conjuncts, left, right) match {
        case Some((lExpr, rExpr, w)) =>
          // buckets: floor(x / w) is BIGINT for double input on both sides
          val lBucketBase = Floor(Divide(lExpr, Literal(w, DoubleType)))
          val rBucket = Alias(
            Floor(Divide(rExpr, Literal(w, DoubleType))), "graft_band_bucket")()
          // left side expands to (bucket−1, bucket, bucket+1)
          val lBucketAttr =
            AttributeReference("graft_band_bucket_l", LongType, nullable = true)()
          val expand = Expand(
            Seq(-1L, 0L, 1L).map(off =>
              left.output :+ Add(lBucketBase, Literal(off, LongType))),
            left.output :+ lBucketAttr, left)
          val projRight = Project(right.output :+ rBucket, right)
          val newCond = And(EqualTo(lBucketAttr, rBucket.toAttribute), cond)
          Project(j.output,
            Join(expand, projRight, Inner, Some(newCond), hint))
        case None => j
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def sided(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
      e.deterministic && e.dataType == DoubleType

  private def hasEquiConjunct(cs: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Boolean = cs.exists {
    case EqualTo(a, b) =>
      (a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) ||
        (a.references.subsetOf(right.outputSet) &&
          b.references.subsetOf(left.outputSet))
    case _ => false
  }

  /** Returns (leftExpr, rightExpr, width) for the first band conjunct. */
  private def findBand(cs: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Double)] = {
    def width(e: Expression): Option[Double] = e match {
      case l: Literal if l.value != null =>
        val d = l.value match {
          case n: java.lang.Number => n.doubleValue()
          case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
          case _ => Double.NaN
        }
        if (d > 0 && java.lang.Double.isFinite(d)) Some(d) else None
      case _ => None
    }
    def orient(a: Expression, b: Expression): Option[(Expression, Expression)] =
      if (sided(a, left) && sided(b, right)) Some((a, b))
      else if (sided(b, left) && sided(a, right)) Some((b, a))
      else None
    cs.collectFirst(Function.unlift {
      case LessThanOrEqual(Abs(Subtract(a, b, _), _), wl) =>
        for { w <- width(wl); (l, r) <- orient(a, b) } yield (l, r, w)
      case GreaterThanOrEqual(wl, Abs(Subtract(a, b, _), _)) =>
        for { w <- width(wl); (l, r) <- orient(a, b) } yield (l, r, w)
      case _ => None
    })
  }

  /** Idempotent runtime install (the driver owns session construction). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this)) {
      spark.experimental.extraOptimizations = cur :+ this
    }
  }
}
