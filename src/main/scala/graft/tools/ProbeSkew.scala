package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the r9 verdict's open design question: should skew
  * salting be an OPTIMIZER RULE, or does AQE's OptimizeSkewedJoin cover
  * the declared shapes so [[graft.ops.Skew.saltedJoin]] stays a library
  * call for the residual case?
  *
  * Shape probed: j13's fact ⋈ dim equi-join with ONE dominant fact key
  * (a rigged lineitem suppkey where ~30% of all rows share one value —
  * far past AQE's 5× median skew trigger), with broadcast DISABLED so the
  * shuffle join actually faces the skew (at a broadcastable dim the skew
  * question is moot — the planner never shuffles the fact side at all,
  * which is answer #0 and j2's declared shape).
  *
  * Variants (interleaved min-of-3, BASELINE.md protocol):
  *  - `smj_skew_on`: sort-merge, AQE skew-join ON with thresholds scaled
  *    to the toy corpus (advisory 1 MB / threshold 2 MB — the same RATIO
  *    production defaults give a 256 MB partition at real scale);
  *  - `smj_skew_off`: identical plan, OptimizeSkewedJoin disabled — the
  *    unmitigated baseline where one task drags the stage;
  *  - `salted_s8`: [[graft.ops.Skew.saltedJoin]] with s = 8, AQE skew OFF
  *    (the library mitigation under test).
  *
  * Run: `sbt 'runMain graft.tools.ProbeSkew [sfDir] [mult]'`. Measured
  * (sf0.1 ×16 ≈ 9.6M fact rows, ~2.9M on the hot key; 2026-08-15, this
  * container, min-of-3): skew split fired, smj_skew_off 1.38 s /
  * smj_skew_on 0.66 s / salted_s8 0.98 s — AQE splits the dominant key's
  * partition by mapper ranges and BEATS static salting (which taxes every
  * row of both sides up front). Decision recorded in Skew.scala: rely on
  * AQE for declared shapes, keep saltedJoin as the library call for the
  * cases AQE cannot see (static non-AQE sessions; joins whose output
  * partitioning a same-key downstream stage must reuse, where AQE
  * refuses to split).
  */
object ProbeSkew {

  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // rigged fact: ~30% of rows collapse onto suppkey 999999 (one dominant
    // key), the rest keep their natural supplier; dim gains the hot key
    val li0 = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
    val li = (0 until mult).map(i => li0.withColumn("l_orderkey",
      col("l_orderkey") + lit(i * 10000000L))).reduce(_ unionByName _)
    val fact = li.withColumn("k",
      when(pmod(xxhash64(col("l_orderkey")), lit(10)) < 3, lit(999999L))
        .otherwise(col("l_suppkey")))
      .select(col("k"), col("l_quantity"))
    val dim = spark.read.parquet(s"$sf/supplier.parquet")
      .select(col("s_suppkey").as("dk"), col("s_acctbal"))
      .unionByName(Seq((999999L, 0.0)).toDF("dk", "s_acctbal"))
    fact.write.mode("overwrite").parquet("/tmp/graft-skew/fact.parquet")
    dim.write.mode("overwrite").parquet("/tmp/graft-skew/dim.parquet")
    val f = spark.read.parquet("/tmp/graft-skew/fact.parquet")
    val d = spark.read.parquet("/tmp/graft-skew/dim.parquet")

    def plain(): DataFrame =
      f.join(d, col("k") === col("dk"))
        .agg(sum(col("l_quantity") * col("s_acctbal")).as("x"))
    def salted(): DataFrame =
      graft.ops.Skew.saltedJoin(f, d, "k", "dk", col("l_quantity"), 8)
        .agg(sum(col("l_quantity") * col("s_acctbal")).as("x"))

    def withConfs(confs: (String, String)*)(body: => DataFrame): Double = {
      val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val t0 = System.nanoTime()
        body.collect()
        (System.nanoTime() - t0) / 1e9
      } finally prior.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val noBroadcast = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.join.preferSortMergeJoin" -> "true")
    val skewOn = noBroadcast ++ Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2097152",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1048576",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val skewOff = noBroadcast ++ Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "false",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")

    val best = scala.collection.mutable.Map[String, Double]()
    (1 to 3).foreach { _ =>
      Seq(
        "smj_skew_on" -> (() => withConfs(skewOn: _*)(plain())),
        "smj_skew_off" -> (() => withConfs(skewOff: _*)(plain())),
        "salted_s8" -> (() => withConfs(skewOff: _*)(salted()))
      ).foreach { case (name, run) =>
        val t = run()
        best(name) = math.min(best.getOrElse(name, Double.MaxValue), t)
      }
    }
    // prove the skew split actually fired (not just "was enabled")
    val firedPlan = {
      val prior = skewOn.map { case (k, _) => k -> spark.conf.getOption(k) }
      skewOn.foreach { case (k, v) => spark.conf.set(k, v) }
      try { val q = plain(); q.collect(); q.queryExecution.executedPlan.toString }
      finally prior.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    println(s"skew split fired: ${firedPlan.contains("skew=true")}")
    best.toSeq.sortBy(_._1).foreach { case (n, t) => println(f"$n%-14s $t%6.2f s") }
    spark.stop()
  }
}
