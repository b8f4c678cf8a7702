package graft

import graft.sources.{Bucketing, Sources}

/** Bucketed co-located joins and partitioned layouts: correct results AND
  * the plan property each layout exists to buy (no shuffle / pruned scan).
  */
class BucketingSpec extends SparkSpec {

  test("partitioned parquet layout prunes partitions at the scan") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val docs = Tables.documents(spark, sf001)
    Sources.writePartitioned(docs, dir, "lang")
    val read = Sources.readPartitioned(spark, dir).filter(col("lang") === "en")
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert("PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(scan).isDefined,
      s"lang filter must prune partitions, not scan them:\n$scan")
    val expected = docs.filter(col("lang") === "en").count()
    assert(read.count() === expected)
  }

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
