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

  test("paired two-sided form (a-b<=w && b-a<=w) fires and equals brute force") {
    // the hand-written band shape the docstring claims — round 9's findBand
    // only matched Abs, so this stayed a nested loop (r9 verdict item 1)
    val l = Seq((1L, 0.0), (2L, 30.0), (3L, -12.5), (4L, 99.9)).toDF("lid", "lv")
    val r = Seq((10L, 24.9), (11L, -37.4), (12L, 125.0), (13L, 0.1)).toDF("rid", "rv")
    def q = l.join(r,
        $"lv" - $"rv" <= lit(25.0) && $"rv" - $"lv" <= lit(25.0))
      .select($"lid", $"rid")
    val expected = pairs(q)
    assert(expected.nonEmpty)
    withRule {
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("graft_band_bucket"), s"paired form did not fire:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(pairs(q) === expected)
    }
  }

  test("BETWEEN and asymmetric bound forms fire and equal brute force") {
    val l = (1 to 100).map(i => (i.toLong, i * 3.0 - 150)).toDF("lid", "lv")
    val r = (1 to 100).map(i => (i.toLong, i * 2.7 - 140)).toDF("rid", "rv")
    // BETWEEN expands to the paired >= / <= conjuncts in the analyzer
    def qb = l.join(r, ($"lv" - $"rv").between(lit(-10.0), lit(10.0)))
      .select($"lid", $"rid")
    // asymmetric band: l − r ∈ [2, 19] (W = 19 covers the interval)
    def qa = l.join(r, $"lv" - $"rv" >= lit(2.0) && $"lv" - $"rv" <= lit(19.0))
      .select($"lid", $"rid")
    val (eb, ea) = (pairs(qb), pairs(qa))
    assert(eb.nonEmpty && ea.nonEmpty)
    withRule {
      for ((q, expected, tag) <- Seq((qb, eb, "between"), (qa, ea, "asym"))) {
        val plan = q.queryExecution.executedPlan.toString
        assert(plan.contains("graft_band_bucket"), s"$tag did not fire:\n$plan")
        assert(pairs(q) === expected, tag)
      }
    }
  }

  test("integer band joins fire and equal brute force (exact long floor-div)") {
    // negatives and exact multiples of w — the cases where truncating
    // division (vs floor) or fp quotients would misbucket
    val l = Seq((1L, -15), (2L, -5), (3L, 0), (4L, 5), (5L, 10), (6L, 23))
      .toDF("lid", "lv")
    val r = Seq((10L, -10), (11L, -1), (12L, 4), (13L, 15), (14L, 30))
      .toDF("rid", "rv")
    def q = l.join(r, abs($"lv" - $"rv") <= lit(5)).select($"lid", $"rid")
    val expected = pairs(q)
    assert(expected.nonEmpty)
    withRule {
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("graft_band_bucket"), s"int band did not fire:\n$plan")
      assert(pairs(q) === expected)
    }
    // long operands + paired form, wide value range
    val ll = (1 to 200).map(i => (i.toLong, i * 977L - 100000L)).toDF("lid", "lv")
    val rr = (1 to 200).map(i => (i.toLong, i * 991L - 101000L)).toDF("rid", "rv")
    def q2 = ll.join(rr,
        $"lv" - $"rv" <= lit(1500L) && $"rv" - $"lv" <= lit(1500L))
      .select($"lid", $"rid")
    val e2 = pairs(q2)
    assert(e2.nonEmpty)
    withRule { assert(pairs(q2) === e2) }
  }

  test("decimal band joins fire and equal brute force (unscaled-long exact)") {
    val l = Seq((1L, "0.00"), (2L, "25.00"), (3L, "-25.00"), (4L, "49.99"),
      (5L, "-0.01")).toDF("lid", "s")
      .select($"lid", $"s".cast("decimal(12,2)").as("lv"))
    val r = Seq((10L, "25.00"), (11L, "-50.00"), (12L, "74.99"), (13L, "0.01"))
      .toDF("rid", "s")
      .select($"rid", $"s".cast("decimal(12,2)").as("rv"))
    def q = l.join(r, abs($"lv" - $"rv") <= lit(BigDecimal("25.00")))
      .select($"lid", $"rid")
    val expected = pairs(q)
    assert(expected.nonEmpty)
    withRule {
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("graft_band_bucket"), s"decimal band did not fire:\n$plan")
      assert(pairs(q) === expected)
    }
  }

  test("ulp boundary negative control: residual-accepted pair at exactly w is kept") {
    // x = −1e−300, y = 0.7, w = 0.7: fl(y − x) rounds to exactly 0.7 so the
    // residual ACCEPTS the pair, but floor(x∕w) = −1 and floor(y∕w) = +1 —
    // bucket distance 2. Round 9's ±1 expand silently DROPPED this pair
    // (verified failing before the ±2 guard band landed); the fp path must
    // keep every pair the residual accepts.
    val l = Seq((1L, -1e-300), (2L, 0.35)).toDF("lid", "lv")
    val r = Seq((10L, 0.7), (11L, 1.4)).toDF("rid", "rv")
    def q = l.join(r, abs($"lv" - $"rv") <= lit(0.7)).select($"lid", $"rid")
    val expected = pairs(q)
    assert(expected.contains((1L, 10L)),
      "fixture drift: the residual no longer accepts the boundary pair")
    withRule {
      assert(q.queryExecution.executedPlan.toString.contains("graft_band_bucket"))
      assert(pairs(q) === expected,
        "fp band rewrite dropped a residual-accepted boundary pair")
    }
  }

  test("long band at Long.MinValue edge: floor-div does not wrap (r10 advice)") {
    // pre-fix floorDiv computed x − pmod(x, w); for x within pmod(x, w) of
    // Long.MinValue the subtraction wrapped to a huge positive value →
    // wrong bucket → silently dropped pairs. The current form
    // (x div w) − [x % w < 0] cannot overflow for any long x, positive w.
    val base = Long.MinValue
    val l = Seq((1L, base), (2L, base + 3), (3L, base + 10), (4L, base + 25))
      .toDF("lid", "lv")
    val r = Seq((10L, base + 1), (11L, base + 7), (12L, base + 24))
      .toDF("rid", "rv")
    def q = l.join(r, abs($"lv" - $"rv") <= lit(5L)).select($"lid", $"rid")
    val expected = pairs(q)
    assert(expected.nonEmpty)
    withRule {
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("graft_band_bucket"), s"edge band did not fire:\n$plan")
      assert(pairs(q) === expected,
        "floor-div wrapped near Long.MinValue and dropped pairs")
    }
  }

  test("session-conf kill switches disable the rule / the fp path (r10 advice)") {
    def fpPlan = bandQuery.queryExecution.executedPlan.toString
    val li = Seq((1L, 0), (2L, 7)).toDF("lid", "lv")
    val ri = Seq((10L, 3), (11L, 9)).toDF("rid", "rv")
    def intPlan = li.join(ri, abs($"lv" - $"rv") <= lit(5))
      .select($"lid", $"rid").queryExecution.executedPlan.toString
    withRule {
      assert(fpPlan.contains("graft_band_bucket"))
      try {
        spark.conf.set(BandJoinToBucket.EnabledKey, "false")
        assert(!fpPlan.contains("graft_band_bucket"), "global kill switch ignored")
        assert(!intPlan.contains("graft_band_bucket"), "global kill switch ignored (int)")
      } finally spark.conf.unset(BandJoinToBucket.EnabledKey)
      try {
        spark.conf.set(BandJoinToBucket.FpEnabledKey, "false")
        assert(!fpPlan.contains("graft_band_bucket"), "fp kill switch ignored")
        // the exact integral path is unaffected by the fp switch
        assert(intPlan.contains("graft_band_bucket"), "fp switch wrongly killed the int path")
      } finally spark.conf.unset(BandJoinToBucket.FpEnabledKey)
      assert(fpPlan.contains("graft_band_bucket"), "switch state leaked")
    }
  }

  test("null-safe equi conjunct (<=>) suppresses the rewrite (r10 advice)") {
    // EqualNullSafe is a native hash key (cf. j21): with one present the
    // planner already hash-joins, and expanding the probe side 3–5× would
    // be a pure perf regression. hasEquiConjunct must treat it like EqualTo.
    val l = Seq((1L, 0.0), (2L, 25.0)).toDF("lid", "lv")
    val r = Seq((1L, 10.0), (3L, 30.0)).toDF("rid", "rv")
    def q = l.join(r, $"lid" <=> $"rid" && abs($"lv" - $"rv") <= lit(25.0))
      .select($"lid", $"rid")
    withRule {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("graft_band_bucket"),
        s"band rewrite fired despite a <=> hash key:\n$plan")
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

  test("integral/decimal paths fuzz-equal brute force across random widths") {
    // the round-10 exact paths across randomized widths, signs and
    // boundary-multiple values — ints with int widths, longs with paired
    // bounds, decimals with 2-dp widths; every trial brute-forced first
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 4) {
      val w = rnd.nextInt(49) + 1
      // int values clustered on multiples of w so exact boundaries occur
      def iv() = (rnd.nextInt(41) - 20) * w + rnd.nextInt(2 * w + 1) - w
      val li = (1 to 250).map(i => (i.toLong, iv())).toDF("lid", "lv")
      val ri = (1 to 250).map(i => (i.toLong, iv())).toDF("rid", "rv")
      def qi = li.join(ri, abs($"lv" - $"rv") <= lit(w)).select($"lid", $"rid")
      val ei = pairs(qi)
      withRule {
        assert(qi.queryExecution.executedPlan.toString
          .contains("graft_band_bucket"), s"int trial $trial (w=$w) no-fire")
        assert(pairs(qi) === ei, s"int trial $trial (w=$w)")
      }
      // long paired form with the same width
      val wl = w.toLong * 977
      def lv() = (rnd.nextInt(41) - 20).toLong * wl + rnd.nextInt(100).toLong
      val ll = (1 to 250).map(i => (i.toLong, lv())).toDF("lid", "lv")
      val rl = (1 to 250).map(i => (i.toLong, lv())).toDF("rid", "rv")
      def ql = ll.join(rl,
          $"lv" - $"rv" <= lit(wl) && $"rv" - $"lv" <= lit(wl))
        .select($"lid", $"rid")
      val el = pairs(ql)
      withRule { assert(pairs(ql) === el, s"long trial $trial (w=$wl)") }
      // decimal(12,2) values on exact cent boundaries of a 2-dp width
      val wd = BigDecimal(rnd.nextInt(4999) + 1) / 100
      def dv() = (BigDecimal(rnd.nextInt(2001) - 1000) * wd / 10)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
      val ld = (1 to 200).map(i => (i.toLong, dv())).toDF("lid", "s")
        .select($"lid", $"s".cast("decimal(12,2)").as("lv"))
      val rd = (1 to 200).map(i => (i.toLong, dv())).toDF("rid", "s")
        .select($"rid", $"s".cast("decimal(12,2)").as("rv"))
      def qd = ld.join(rd, abs($"lv" - $"rv") <= lit(wd.setScale(2)))
        .select($"lid", $"rid")
      val ed = pairs(qd)
      withRule {
        assert(qd.queryExecution.executedPlan.toString
          .contains("graft_band_bucket"), s"dec trial $trial (w=$wd) no-fire")
        assert(pairs(qd) === ed, s"decimal trial $trial (w=$wd)")
      }
    }
  }
}
