package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.BandJoinToBucket

/** [[graft.plans.BandJoinToBucket]] — the optimizer rule that turns a raw
  * band theta join (`abs(a − b) <= w`, no equi key → nested-loop plan) into
  * j19's bucketed equi-join shape automatically.
  */
class BandJoinSpec extends SparkSpec {
  import spark.implicits._

  private def bandQuery: DataFrame =
    Tables.supplier(spark, sf001).select($"s_suppkey", $"s_acctbal")
      .join(Tables.customer(spark, sf001).select($"c_custkey", $"c_acctbal"),
        abs($"s_acctbal" - $"c_acctbal") <= 25.0)
      .select($"s_suppkey", $"c_custkey")

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def withRule[A](body: => A): A = {
    val prior = spark.experimental.extraOptimizations
    try { BandJoinToBucket.install(spark); body }
    finally { spark.experimental.extraOptimizations = prior }
  }

  test("band theta join rewrites to a bucketed hash join, results identical") {
    val before = bandQuery
    val beforePlan = before.queryExecution.executedPlan.toString
    assert(beforePlan.contains("BroadcastNestedLoopJoin"),
      s"baseline should be the nested-loop plan the rule exists to kill:\n$beforePlan")
    val expected = pairs(before)
    assert(expected.nonEmpty) // fixture probe: 5 pairs at sf0.001
    withRule {
      val after = bandQuery
      val plan = after.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), s"rule did not fire:\n$plan")
      assert(plan.contains("graft_band_bucket"), plan)
      assert(pairs(after) === expected)
    }
  }

  test("rule equals brute force on adversarial values (boundaries, negatives, nulls)") {
    // exact bucket boundaries (multiples of w), negative values, a null —
    // the cases where floor-bucketing or null semantics could drift
    val l = Seq((1L, 0.0), (2L, 25.0), (3L, -25.0), (4L, 50.0), (5L, -0.0),
      (6L, 74.999), (7L, 75.0)).toDF("lid", "lv")
    val r = Seq((10L, 25.0), (11L, -50.0), (12L, 100.0), (13L, 0.0))
      .toDF("rid", "rv")
      .union(Seq((14L, Option.empty[Double])).toDF("rid", "rv"))
    def q = l.join(r, abs($"lv" - $"rv") <= lit(25.0)).select($"lid", $"rid")
    val expected = pairs(q)
    withRule {
      assert(pairs(q) === expected)
      assert(q.queryExecution.executedPlan.toString.contains("graft_band_bucket"))
    }
  }

  test("rule leaves equi-keyed and non-band joins untouched") {
    withRule {
      // already has an equi key → expanding would only triple the probe side
      val equi = Tables.nation(spark, sf001)
        .join(Tables.customer(spark, sf001),
          $"n_nationkey" === $"c_nationkey" &&
            abs($"c_acctbal" - lit(0.0)) <= 25.0)
      assert(!equi.queryExecution.executedPlan.toString
        .contains("graft_band_bucket"))
      // plain inequality theta (j8's shape) is not a band
      val theta = Tables.region(spark, sf001)
        .join(Tables.nation(spark, sf001), $"r_regionkey" < $"n_regionkey")
      assert(!theta.queryExecution.executedPlan.toString
        .contains("graft_band_bucket"))
    }
  }

  test("rule equals brute force on seeded random value clouds") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val w = Seq(5.0, 25.0, 0.7)(trial - 1)
      val l = (1 to 300).map(i => (i.toLong, rnd.nextDouble() * 200 - 100))
        .toDF("lid", "lv")
      val r = (1 to 300).map(i => (i.toLong, rnd.nextDouble() * 200 - 100))
        .toDF("rid", "rv")
      def q = l.join(r, abs($"lv" - $"rv") <= lit(w)).select($"lid", $"rid")
      val expected = pairs(q)
      withRule {
        assert(pairs(q) === expected, s"trial $trial (w=$w)")
      }
    }
  }
}
