package graft

import org.apache.spark.sql.functions._

/** Pins the round-10 skew DESIGN DECISION (Skew.scala scaladoc, measured
  * by graft.tools.ProbeSkew): AQE's OptimizeSkewedJoin — not a static
  * salting rule — is the engine's default mitigation, so this spec proves
  * the AQE path actually FIRES on the one-dominant-key shape the decision
  * relies on, and that the explicit library fallback stays
  * result-identical to the plain join.
  */
class SkewSpec extends SparkSpec {

  test("AQE OptimizeSkewedJoin fires on the one-dominant-key join shape") {
    // ~40% of fact rows on ONE key; thresholds scaled to the toy corpus at
    // the production RATIO (a hot partition several × the advisory size)
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.range(200000).select(
        when(pmod(col("id"), lit(10)) < 4, lit(7L))
          .otherwise(pmod(col("id"), lit(1000))).as("k"),
        col("id").as("v"))
      val dim = spark.range(1001).select(col("id").as("dk"),
        (col("id") * 2).as("w"))
      val q = fact.join(dim, col("k") === col("dk"))
        .agg(sum(col("v") + col("w")).as("x"))
      val expected = q.collect().map(_.getLong(0)).toSeq
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not fire on the dominant-key shape:\n$plan")
      assert(expected.nonEmpty)
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltedJoin is result-identical to the plain join (hot key, nulls in salt source)") {
    import spark.implicits._
    val fact = (1 to 5000).map { i =>
      (if (i % 3 == 0) 7L else (i % 50).toLong,
        if (i % 11 == 0) Option.empty[Double] else Some(i.toDouble))
    }.toDF("k", "payload")
    val dim = (0 until 51).map(i => (i.toLong, i * 1.5)).toDF("dk", "w")
      .unionByName(Seq((999L, 0.0)).toDF("dk", "w"))
    val plain = fact.join(dim, col("k") === col("dk"))
      .select(col("k"), col("payload"), col("w"))
    val salted = ops.Skew.saltedJoin(fact, dim, "k", "dk", col("payload"), 8)
      .select(col("k"), col("payload"), col("w"))
    val a = plain.collect().map(_.toString).sorted.toSeq
    val b = salted.collect().map(_.toString).sorted.toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }
}
