package graft.tools

import org.apache.spark.sql.SparkSession

/** Count-pruning audit: for every declared query, does wrapping it in a
  * global `count()` drop join/aggregate/generate nodes from the optimized
  * plan? Any hit means `df.count()` is NOT a faithful timed action for that
  * query (see [[graft.BenchAction]] — the benchmark tools time a noop-sink
  * write for exactly this reason). Plan-only, no execution; run after
  * adding a query: `sbt 'runMain graft.tools.CountPruneAudit'`.
  *
  * Round-7 finding that motivated this: x24's final left-outer join has a
  * unique right-side key and contributes no columns to a count, so Catalyst
  * eliminated the join and transitively the whole n-gram/index subtree —
  * count() timed a metadata-only parquet count (0.2 s) where the real warm
  * query is ~2.6 s at sf0.1. 7/100 queries were count-pruned to some
  * degree: j4, r4, a14, s7, x14, x15, x24.
  */
object CountPruneAudit {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.install(spark)
    import org.apache.spark.sql.catalyst.plans.logical._
    def shape(p: LogicalPlan): (Int, Int, Int) = {
      var j = 0; var a = 0; var g = 0
      p.foreach {
        case _: Join => j += 1
        case _: Aggregate => a += 1
        case _: Generate => g += 1
        case _ => ()
      }
      (j, a, g)
    }
    var hits = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (q, fn) =>
      val full = shape(fn(spark, d).queryExecution.optimizedPlan)
      val c = shape(fn(spark, d).groupBy().count().queryExecution.optimizedPlan)
      val cnt = (c._1, c._2 - 1, c._3) // subtract the count() agg itself
      if (cnt != full) { hits += 1; println(s"PRUNED $q full=$full count=$cnt") }
    }
    println(s"count-pruned queries: $hits (timed via BenchAction, so informational)")
    spark.stop()
  }
}
