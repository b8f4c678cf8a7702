package graft

import graft.sources.Bucketing

/** Bucketed co-located joins: correct results AND a shuffle-free plan. */
class BucketingSpec extends SparkSpec {

  test("join of same-bucketed tables plans without a shuffle exchange") {
    val orders = Tables.orders(spark, sf001)
    val customer = Tables.customer(spark, sf001)
    Bucketing.writeBucketed(orders, "orders_b", "o_custkey", 8)
    Bucketing.writeBucketed(customer, "customer_b", "c_custkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark, "orders_b", "customer_b",
        "o_custkey", "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() ===
        orders.join(customer, orders("o_custkey") === customer("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
