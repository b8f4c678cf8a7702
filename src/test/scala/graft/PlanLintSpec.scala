package graft

/** Plan lint over the ENTIRE declared surface: walk every query's physical
  * plan and reject the patterns that do not survive a 1000-executor cluster.
  *
  * CartesianProductExec is Spark's non-broadcast unkeyed cross join — the
  * all-pairs shape every similarity operator here is specifically designed
  * to avoid. Declared cross/nested-loop joins (j10, l3, l6, x11 codebook,
  * a12-style stats broadcasts) must all plan as BroadcastNestedLoopJoin
  * with the TINY side built, never CartesianProduct. A regression that
  * swaps a keyed or broadcast join for a cartesian one fails here before
  * it ever reaches the bench.
  */
class PlanLintSpec extends SparkSpec {

  test("no declared query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val plan = fn(spark, sf001).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian plans: ${offenders.mkString(", ")}")
  }

  test("every declared query's optimized plan builds without error") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val qe = fn(spark, sf001).queryExecution
      assert(qe.optimizedPlan != null, name)
    }
  }
}
