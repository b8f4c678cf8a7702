package graft

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, NGrams, SignBands}

/** Single entry point wiring every graft Catalyst extension into a session:
  * the `YearEqualsToRange` optimizer rule, the `TopKPerGroup` planner
  * strategy, and SQL registrations of the native expressions
  * (`graft_dot`, `graft_sign_bands`, `graft_ngrams`, `graft_trigrams`).
  *
  * Two installation routes:
  *  - config-time: `spark.sql.extensions=graft.GraftExtensions` (or
  *    `builder.withExtensions(new GraftExtensions)`) — the idiomatic
  *    packaging for a cluster deployment;
  *  - runtime: `GraftExtensions.install(spark)` for sessions the caller
  *    does not construct (the driver owns session creation here).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.YearEqualsToRange)
    ext.injectOptimizerRule(_ => graft.plans.BandJoinToBucket)
    ext.injectOptimizerRule(_ => graft.plans.OrJoinToUnion)
    ext.injectOptimizerRule(_ => graft.plans.RowNumberTopK)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    GraftExtensions.functions.foreach(ext.injectFunction)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case lit if lit.foldable => lit.eval().asInstanceOf[Int]
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (identifier, info, builder) triples in the shape injectFunction and
    * FunctionRegistry.registerFunction share.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("graft_sign_bands"),
      new ExpressionInfo(classOf[SignBands].getName, "graft_sign_bands"),
      (args: Seq[Expression]) =>
        SignBands(args(0), intArg(args(1), "graft_sign_bands bands"),
          intArg(args(2), "graft_sign_bands bits"))),
    (FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[NGrams].getName, "graft_ngrams"),
      (args: Seq[Expression]) => NGrams(args(0), intArg(args(1), "graft_ngrams n"))),
    (FunctionIdentifier("graft_trigrams"),
      new ExpressionInfo(classOf[NGrams].getName, "graft_trigrams"),
      (args: Seq[Expression]) => NGrams(args(0), 3)))

  /** Idempotent runtime install into a live session. */
  def install(spark: SparkSession): Unit = {
    graft.plans.YearEqualsToRange.install(spark)
    graft.plans.BandJoinToBucket.install(spark)
    graft.plans.OrJoinToUnion.install(spark)
    graft.plans.RowNumberTopK.install(spark)
    graft.plans.TopKStrategy.install(spark)
    functions.foreach { case (ident, info, builder) =>
      GraftBridge.registerFunction(spark, ident, info, builder)
    }
  }
}
