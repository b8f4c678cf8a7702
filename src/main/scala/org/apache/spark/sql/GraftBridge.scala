package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private Column↔Expression converters so graft
  * can expose native Catalyst expressions through the public Column API
  * (standard technique for Spark extension libraries; Spark 4 moved these
  * helpers behind `private[sql]`).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Drain the listener bus (private[spark]) so tests can deterministically
    * assert on listener-observed job counts.
    */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** SQLMetric whose cross-task aggregation takes MAX instead of SUM —
    * for per-task state-size watermarks (e.g. TopKPerGroupExec's largest
    * per-group tie-class buffer), where summing task maxima over-reports
    * and hides the actual high-water mark. Each task `set`s its local
    * maximum on its own copy; the driver-side `merge` keeps the largest.
    * Lives here because `AccumulatorV2.register` is private[spark].
    */
  def createMaxMetric(sc: org.apache.spark.SparkContext,
      name: String): org.apache.spark.sql.execution.metric.SQLMetric = {
    val m = new org.apache.spark.sql.execution.metric.SQLMetric("sum", 0L) {
      override def merge(
          other: org.apache.spark.util.AccumulatorV2[Long, Long]): Unit =
        if (other.value > value) set(other.value)
    }
    m.register(sc, Some(name), countFailedValues = false)
    m
  }

  /** Register a native expression in the live session's FunctionRegistry
    * (sessionState is private[sql]) — the runtime analog of
    * SparkSessionExtensions.injectFunction for sessions the caller did not
    * construct.
    */
  def registerFunction(spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(ident, info, builder)
}
