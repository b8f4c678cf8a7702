package graft

import org.apache.spark.sql.functions._
import graft.plans.YearEqualsToRange

/** The year()=Y → range optimizer rule: plan shape and result equivalence. */
class PlanRuleSpec extends SparkSpec {

  test("year(ts)=Y rewrites to a pushdown-friendly range with equal results") {
    val df = Tables.orders(spark, sf001)
    val unopt = df.filter(year(col("o_orderdate")) === 1996)
      .select("o_orderkey").orderBy("o_orderkey").collect().toSeq

    YearEqualsToRange.install(spark)
    try {
      val q = df.filter(year(col("o_orderdate")) === 1996)
        .select("o_orderkey").orderBy("o_orderkey")
      val optimized = q.queryExecution.optimizedPlan
      assert(!optimized.toString.toLowerCase.contains("year("),
        s"year() survived optimization:\n$optimized")
      val pushed = q.queryExecution.executedPlan.toString
      assert(pushed.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate")
        || pushed.contains("GreaterThanOrEqual(o_orderdate"),
        s"range not pushed to scan:\n$pushed")
      assert(q.collect().toSeq == unopt)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == YearEqualsToRange)
    }
  }

  test("rule leaves non-equality year() uses and other types alone") {
    YearEqualsToRange.install(spark)
    try {
      val df = Tables.orders(spark, sf001)
      // year >= comparison is not rewritten (rule targets equality only)
      val cnt = df.filter(year(col("o_orderdate")) >= 1996).count()
      val expected = df.filter(col("o_orderdate") >= "1996-01-01").count()
      assert(cnt === expected)
      // grouping by year still works
      assert(df.groupBy(year(col("o_orderdate"))).count().count() > 0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == YearEqualsToRange)
    }
  }
}
