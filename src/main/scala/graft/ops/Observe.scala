package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Pipeline observability via Spark's Observation API (SURVEY §2.8
  * capability tier): named metric expressions attached to a frame with
  * `df.observe` are computed AS THE ACTION RUNS — accumulator-style, on the
  * rows that actually flow — so a pipeline gets its row-count / token-mass /
  * null-rate audits for free instead of paying a second corpus pass (or,
  * worse, re-running a non-deterministic sample). At 100 TB that second
  * pass is hours; this is the difference between "audited every run" and
  * "audited when someone asks".
  *
  * The metrics must be aggregate expressions without distinct/filter
  * subqueries (Spark's observe contract); `ObserveSpec` asserts the
  * observed values equal a separate exact aggregation on the fixture
  * ingest pipeline.
  */
object Observe {

  /** Attach named metrics to `df`; returns (instrumented frame,
    * observation handle). Read `obs.get` AFTER an action has run the frame.
    */
  def audited(df: DataFrame, name: String, metrics: Seq[(String, Column)])
      : (DataFrame, Observation) = {
    val obs = Observation(name)
    val named = metrics.map { case (n, c) => c.as(n) }
    (df.observe(obs, named.head, named.tail: _*), obs)
  }
}
