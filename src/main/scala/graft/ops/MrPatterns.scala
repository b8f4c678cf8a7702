package graft.ops

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** The reference's four hand-coded MapReduce idioms, reproduced faithfully on
  * Spark's RDD API [RECON: `ahaque/rdf-mapreduce-joins` implements every
  * query as tagged shuffles + reducer joins, distributed-cache map-side
  * joins, combiners, and shuffle secondary sort — SURVEY.md §3.1]. The
  * DataFrame operators in this library are the idiomatic replacements; this
  * module exists to show the correspondence explicitly (north star:
  * "DataFrame joins + RDD operations") and is equivalence-tested against the
  * DataFrame results in `MrPatternsSpec`.
  */
object MrPatterns {

  /** Reduce-side (repartition) join: both inputs keyed and tagged, one
    * shuffle co-partitions them, the "reducer" (cogroup) nested-loops the
    * per-key buckets — the reference's default join strategy [RECON].
    */
  def reduceSideJoin(spark: SparkSession, d: String): RDD[(Long, (Long, String))] = {
    val orders = graft.Tables.orders(spark, d)
      .select("o_custkey", "o_orderkey").rdd
      .map(r => (r.getLong(0), r.getLong(1)))
    val customers = graft.Tables.customer(spark, d)
      .select("c_custkey", "c_name").rdd
      .map(r => (r.getLong(0), r.getString(1)))
    orders.cogroup(customers, new HashPartitioner(8))
      .flatMap { case (k, (os, cs)) =>
        for (o <- os; c <- cs) yield (k, (o, c))
      }
  }

  /** Map-side join: the small relation rides a broadcast variable (the
    * distributed-cache analog [RECON]) and each partition hash-probes it —
    * no shuffle at all.
    *
    * SMALL-DIM ONLY: `collectAsMap` materializes the dimension on the
    * driver, exactly like the reference's distributed cache — a pedagogical
    * mirror, not a declared query path. The production-declared equivalent is
    * j2's `broadcast()` join, where the build side never touches driver heap
    * as a Scala map.
    */
  def mapSideJoin(spark: SparkSession, d: String): RDD[(Long, (Long, String))] = {
    val customers = spark.sparkContext.broadcast(
      graft.Tables.customer(spark, d).select("c_custkey", "c_name").rdd
        .map(r => (r.getLong(0), r.getString(1))).collectAsMap())
    graft.Tables.orders(spark, d).select("o_custkey", "o_orderkey").rdd
      .mapPartitions { rows =>
        val dim = customers.value
        rows.flatMap { r =>
          val k = r.getLong(0)
          dim.get(k).map(name => (k, (r.getLong(1), name)))
        }
      }
  }

  /** Combiner aggregation: aggregateByKey does the mapper-side partial
    * (combine) before the shuffle, exactly the reference's Combiner [RECON].
    * Sums in BigDecimal so the result is partition-order independent.
    */
  def combinerAgg(spark: SparkSession, d: String): RDD[(String, (BigDecimal, Long))] =
    graft.Tables.lineitem(spark, d).select("l_returnflag", "l_quantity").rdd
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)))
      .aggregateByKey((BigDecimal(0), 0L))(
        { case ((s, n), q) => (s + q, n + 1) },
        { case ((s1, n1), (s2, n2)) => (s1 + s2, n1 + n2) })

  /** Secondary sort: composite (key, order-date) shuffle key with
    * repartitionAndSortWithinPartitions + a partitioner on the primary key
    * only — the reducer sees each customer's orders already date-ordered,
    * the reference's shuffle-sort contract [RECON].
    */
  def secondarySort(spark: SparkSession, d: String): RDD[((Long, Long), Long)] = {
    val keyed = graft.Tables.orders(spark, d)
      .select("o_custkey", "o_orderdate", "o_orderkey").rdd
      .map((r: Row) => ((r.getLong(0),
        // o_orderdate is TIMESTAMP_NTZ → LocalDateTime in the Row
        r.getAs[java.time.LocalDateTime](1).toEpochSecond(java.time.ZoneOffset.UTC)),
        r.getLong(2)))
    val byCustomer = new org.apache.spark.Partitioner {
      private val delegate = new HashPartitioner(8)
      def numPartitions: Int = delegate.numPartitions
      def getPartition(key: Any): Int =
        delegate.getPartition(key.asInstanceOf[(Long, Long)]._1)
    }
    keyed.repartitionAndSortWithinPartitions(byCustomer)
  }

  /** DataFrame equivalent of combinerAgg for the equivalence test. */
  def combinerAggDf(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.Tables.lineitem(spark, d)
      .groupBy("l_returnflag")
      .agg(sum(graft.Det.dec2(col("l_quantity"))).as("sum_qty"),
        count(lit(1)).as("cnt"))
  }
}
