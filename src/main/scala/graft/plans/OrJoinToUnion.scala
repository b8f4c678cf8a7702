package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite an inner DISJUNCTIVE join — condition
  * `e1 OR e2` where EACH disjunct carries its own cross-side equi
  * conjunct — into UNION ALL of two hash joins, the textbook OR-join
  * decomposition Spark does not perform on its own.
  *
  * With a top-level OR Spark finds no extractable equi key, so the
  * planner's only options are broadcast-nested-loop or cartesian: O(n·m)
  * predicate evaluations and a corpus-sized broadcast. The rewrite emits
  *
  *   Join(L, R, e1)  UNION ALL  Join(L, R, e2 AND NOT coalesce(e1, false))
  *
  * Each branch now has a conjunctive condition whose equi part the
  * planner extracts as a hash key. The result is the exact original
  * MULTISET: a pair satisfying e1 appears only in branch 1 (branch 2
  * excludes it), a pair satisfying e2-but-not-e1 only in branch 2, and
  * SQL's null-as-false join semantics are preserved because
  * `NOT coalesce(e1, false)` is true exactly when e1 is false OR null —
  * the cases where the pair did NOT come out of branch 1.
  *
  * Fire conditions (all checked, otherwise untouched):
  *  - inner join, condition present and DETERMINISTIC;
  *  - the condition's top level is `e1 OR e2` (a top-level AND equi
  *    conjunct means the planner already has a hash key — the transform
  *    pattern simply won't see an Or there);
  *  - each disjunct, split on AND, contains at least one `a = b` with
  *    `a` referring only to one side and `b` only to the other.
  *
  * Both branches reference the SAME child subplans — Spark's shuffle
  * stage reuse applies where keys coincide, and duplicated attribute ids
  * across Union branches are the same shape the built-in
  * RewriteIntersectAll/RewriteExceptAll rules emit.
  *
  * Installed via [[GraftExtensions]] (config-time) or `install(spark)`
  * (runtime). The declared `j20_or_join` rides this rule: its Spark
  * side states the plain OR predicate and the plan lint asserts no
  * nested loop survives.
  */
object OrJoinToUnion extends Rule[LogicalPlan] {

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(Or(e1, e2)), hint)
        if e1.deterministic && e2.deterministic &&
          hasCrossEqui(e1, left, right) && hasCrossEqui(e2, left, right) =>
      val guarded = And(e2, Not(Coalesce(Seq(e1, Literal(false)))))
      Union(
        Join(left, right, Inner, Some(e1), hint),
        Join(left, right, Inner, Some(guarded), hint))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def hasCrossEqui(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Boolean = splitConjuncts(e).exists {
    case EqualTo(a, b) =>
      (a.references.nonEmpty && b.references.nonEmpty &&
        a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) ||
        (a.references.nonEmpty && b.references.nonEmpty &&
          a.references.subsetOf(right.outputSet) &&
          b.references.subsetOf(left.outputSet))
    case _ => false
  }

  /** Idempotent runtime install (the driver owns session construction). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this)) {
      spark.experimental.extraOptimizations = cur :+ this
    }
  }
}
