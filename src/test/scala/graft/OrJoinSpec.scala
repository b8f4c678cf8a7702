package graft

import org.apache.spark.sql.DataFrame
import graft.plans.OrJoinToUnion

/** [[graft.plans.OrJoinToUnion]] — the optimizer rule that decomposes a
  * disjunctive inner join (`e1 OR e2`, each disjunct with its own
  * cross-side equi conjunct) into UNION ALL of two hash joins with the
  * second branch guarded by NOT coalesce(e1, false).
  */
class OrJoinSpec extends SparkSpec {
  import spark.implicits._

  private def orQuery: DataFrame =
    Tables.supplier(spark, sf001)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
      .join(Tables.customer(spark, sf001)
          .select($"c_custkey", $"c_nationkey", $"c_acctbal"),
        $"s_nationkey" === $"c_nationkey" || $"s_acctbal" === $"c_acctbal")
      .select($"s_suppkey", $"c_custkey")

  private def pairs(df: DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  private def withRule[A](body: => A): A = {
    val prior = spark.experimental.extraOptimizations
    try { OrJoinToUnion.install(spark); body }
    finally { spark.experimental.extraOptimizations = prior }
  }

  test("disjunctive join rewrites to union of hash joins, results identical") {
    val before = orQuery
    val beforePlan = before.queryExecution.executedPlan.toString
    assert(beforePlan.contains("BroadcastNestedLoopJoin"),
      s"baseline should be the nested-loop plan the rule exists to kill:\n$beforePlan")
    val expected = pairs(before) // MULTISET equality — sorted Seq, not Set
    assert(expected.nonEmpty)
    withRule {
      val after = orQuery
      val plan = after.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), s"rule did not fire:\n$plan")
      assert(plan.contains("Union"), plan)
      assert(pairs(after) === expected)
    }
  }

  test("rule equals brute force with nulls and both-predicates-true overlap") {
    // rows matching BOTH disjuncts must appear exactly once; null keys on
    // either disjunct must stay null-as-false
    val l = Seq((1L, Some(1L), Some(10.0)), (2L, Some(2L), Some(20.0)),
      (3L, None: Option[Long], Some(10.0)), (4L, Some(4L), None: Option[Double]),
      (5L, None: Option[Long], None: Option[Double]))
      .toDF("lid", "lk", "lv")
    val r = Seq((10L, Some(1L), Some(10.0)), (11L, Some(9L), Some(10.0)),
      (12L, Some(2L), None: Option[Double]), (13L, None: Option[Long], Some(20.0)))
      .toDF("rid", "rk", "rv")
    def q = l.join(r, $"lk" === $"rk" || $"lv" === $"rv")
      .select($"lid", $"rid")
    val expected = pairs(q)
    // hand-check the overlap row: (1, 10) matches both predicates → once
    assert(expected.count(_ == ((1L, 10L))) === 1)
    withRule {
      val after = q
      assert(after.queryExecution.executedPlan.toString.contains("Union"))
      assert(pairs(after) === expected)
    }
  }

  test("rule leaves conjunctive, non-equi-disjunct and outer joins untouched") {
    withRule {
      // plain equi join (no OR) — must not grow a Union
      val equi = Tables.nation(spark, sf001)
        .join(Tables.customer(spark, sf001), $"n_nationkey" === $"c_nationkey")
      assert(!equi.queryExecution.optimizedPlan.toString.contains("Union"))
      // OR of inequalities — neither disjunct has an equi key, no rewrite
      val theta = Tables.region(spark, sf001)
        .join(Tables.nation(spark, sf001),
          $"r_regionkey" < $"n_regionkey" || $"r_regionkey" > $"n_regionkey" + 2)
      assert(!theta.queryExecution.optimizedPlan.toString.contains("Union"))
      // left outer OR join: branch semantics differ (unmatched rows) — the
      // rule is inner-only and must not fire
      val outer = Tables.supplier(spark, sf001)
        .join(Tables.customer(spark, sf001),
          $"s_nationkey" === $"c_nationkey" || $"s_acctbal" === $"c_acctbal",
          "left")
      assert(!outer.queryExecution.optimizedPlan.toString.contains("Union"))
      assert(outer.count() >= Tables.supplier(spark, sf001).count())
    }
  }

  test("declared j20 under the installed rule plans union of hash joins") {
    withRule {
      val p = SparkEntry.queries("j20_or_join")(spark, sf001)
        .queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), s"j20 kept a nested loop:\n$p")
      assert(p.contains("Union"), p)
    }
  }

  test("3-way OR flattens the nested Or and plans three hash joins") {
    // the parser nests a 3-way OR as Or(Or(e1,e2),e3) — round 9's 2-disjunct
    // matcher silently no-fired on it (verdict item 3)
    val rnd = new scala.util.Random(11)
    val l = (1 to 150).map(i => (i.toLong, rnd.nextInt(8).toLong,
      rnd.nextInt(15).toLong, rnd.nextInt(5).toLong)).toDF("lid", "lk", "lv", "lw")
    val r = (1 to 150).map(i => (i.toLong, rnd.nextInt(8).toLong,
      rnd.nextInt(15).toLong, rnd.nextInt(5).toLong)).toDF("rid", "rk", "rv", "rw")
    def q = l.join(r,
        $"lk" === $"rk" || $"lv" === $"rv" || $"lw" === $"rw")
      .select($"lid", $"rid")
    val expected = pairs(q) // brute-force nested loop, multiset
    assert(expected.nonEmpty)
    withRule {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), s"3-way OR did not fire:\n$plan")
      val hashJoins = "HashJoin".r.findAllIn(plan).size
      assert(hashJoins >= 3, s"expected 3 hash-join branches, plan:\n$plan")
      assert(pairs(q) === expected)
    }
    // no-fire guard: one disjunct without an equi key keeps the whole OR
    def qBad = l.join(r,
        $"lk" === $"rk" || $"lv" === $"rv" || $"lw" < $"rw")
      .select($"lid", $"rid")
    withRule {
      assert(!qBad.queryExecution.optimizedPlan.toString.contains("Union"))
    }
  }

  test("non-deterministic child blocks the rewrite (exact-multiset guard)") {
    // a rand()-derived input evaluated once per branch would change between
    // branches — the rule must not fire (ADVICE r9: plan-level determinism)
    // parquet-backed child: over a LocalRelation, ConvertToLocalRelation
    // legitimately materializes seeded rand() into literal rows before our
    // rule sees the plan (at which point firing is correct) — a file scan
    // keeps the non-deterministic Project alive into the optimizer batch
    val l = Tables.nation(spark, sf001)
      .select($"n_nationkey".as("lid"), $"n_regionkey".as("lk"))
      .withColumn("noise", org.apache.spark.sql.functions.rand(42))
    val r = Tables.region(spark, sf001)
      .select($"r_regionkey".as("rid"), $"r_regionkey".as("rk"),
        ($"r_regionkey" + 1).as("rv"))
    // noise stays in the OUTPUT so column pruning can't drop it either
    def q = l.join(r, $"lk" === $"rk" || $"lk" === $"rv")
      .select($"lid", $"rid", $"noise")
    withRule {
      assert(!q.queryExecution.optimizedPlan.toString.contains("Union"),
        "rule fired over a non-deterministic child")
    }
  }

  test("rule equals brute force on seeded random keys (heavy overlap)") {
    val rnd = new scala.util.Random(7)
    val l = (1 to 200).map(i =>
      (i.toLong, rnd.nextInt(10).toLong, rnd.nextInt(20).toLong)).toDF("lid", "lk", "lv")
    val r = (1 to 200).map(i =>
      (i.toLong, rnd.nextInt(10).toLong, rnd.nextInt(20).toLong)).toDF("rid", "rk", "rv")
    def q = l.join(r, $"lk" === $"rk" || $"lv" === $"rv").select($"lid", $"rid")
    val expected = pairs(q)
    withRule {
      assert(pairs(q) === expected)
    }
  }
}
