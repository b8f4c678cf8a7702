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

  test("shard sink: one file per shard, shard 0 reads back in curriculum order") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_shard").toString
    val packed = graft.sources.ShardSink.pack(spark, sf001)
    graft.sources.ShardSink.write(packed, dir)
    val shards = packed.select("shard").distinct().collect()
      .map(_.getLong(0)).sorted
    assert(shards.length > 1, "fixture must pack into >1 shard")
    // layout: every shard directory exists and holds exactly ONE data file
    shards.foreach { sh =>
      val files = new java.io.File(s"$dir/shard=$sh").listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
      assert(files.length === 1, s"shard $sh must be one sequential file")
    }
    // root read with a shard predicate prunes to the one directory
    val pruned = spark.read.parquet(dir).filter(col("shard") === 0)
    val scan = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*shard".r.findFirstIn(scan).isDefined,
      s"shard filter must prune partitions:\n$scan")
    // round-trip: shard 0 comes back as one split, rows already in
    // curriculum order (quality desc, doc_id), cum_tokens strictly
    // increasing, and the first doc starts inside shard 0's token range
    val rt = graft.sources.ShardSink.readShard(spark, dir, 0)
    assert(rt.rdd.getNumPartitions === 1)
    val rows = rt.select("doc_id", "quality", "wc", "cum_tokens", "text")
      .collect()
    val expect = packed.filter(col("shard") === 0)
      .orderBy(col("quality").desc, col("doc_id"))
      .select("doc_id", "quality", "wc", "cum_tokens", "text").collect()
    assert(rows.toSeq === expect.toSeq)
    val cums = rows.map(_.getAs[Long]("cum_tokens"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b })
    assert(cums.head - rows.head.getAs[Long]("wc") <
      graft.ops.Pipeline.ShardTokens)
    assert(rows.forall(r => r.getAs[String]("text") != null))
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
