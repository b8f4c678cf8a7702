package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.RowNumberTopK

/** [[graft.plans.RowNumberTopK]] — the optimizer rule that collapses the
  * `row_number() OVER (...) <= k` idiom into the bounded-heap TopKPerGroup
  * operator when the projection DROPS the rank column (the rank-kept form
  * belongs to Spark's native InferWindowGroupLimit — pinned below).
  */
class RowNumberTopKSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[A](body: => A): A = {
    val priorOpt = spark.experimental.extraOptimizations
    val priorStrat = spark.experimental.extraStrategies
    try { RowNumberTopK.install(spark); body }
    finally {
      spark.experimental.extraOptimizations = priorOpt
      spark.experimental.extraStrategies = priorStrat
    }
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private val w = Window.partitionBy($"p_brand")
    .orderBy($"p_retailprice".desc, $"p_partkey") // total order

  /** The drop-rn top-3 shape the rule exists for. */
  private def topkDropRn: DataFrame =
    Tables.part(spark, sf001)
      .select($"p_brand", $"p_partkey", $"p_retailprice",
        row_number().over(w).as("rn"))
      .filter($"rn" <= 3)
      .select($"p_brand", $"p_partkey", $"p_retailprice")

  test("drop-rn top-3 collapses to the bare heap operator, results identical") {
    val expected = rows(topkDropRn) // vanilla (native WindowGroupLimit) plan
    assert(expected.nonEmpty)
    withRule {
      val plan = topkDropRn.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup"), s"rule did not fire:\n$plan")
      assert(!plan.contains("Window"), s"window assembly should be gone:\n$plan")
      // partial heaps → ONE exchange → final merge; the old
      // UnknownPartitioning default cost a second exchange here
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges === 1, s"expected a single exchange:\n$plan")
      assert(rows(topkDropRn) === expected)
      val n = topkDropRn.queryExecution.optimizedPlan.collect {
        case t: graft.plans.TopKPerGroupNode => t
      }.size
      assert(n === 1, s"expected one TopK node, got $n")
    }
  }

  test("rn = 1 argmax and global (unpartitioned) top-k both fire when rn dropped") {
    def argmax = Tables.part(spark, sf001)
      .select($"p_brand", $"p_partkey", $"p_retailprice",
        row_number().over(w).as("rn"))
      .filter($"rn" === 1)
      .select($"p_brand", $"p_partkey")
    val wGlob = Window.orderBy($"p_retailprice".desc, $"p_partkey")
    def global = Tables.part(spark, sf001)
      .select($"p_partkey", $"p_retailprice",
        row_number().over(wGlob).as("rn"))
      .filter($"rn" < 6) // strict < : bound k = 5
      .select($"p_partkey")
    val (ea, eg) = (rows(argmax), rows(global))
    assert(eg.size === 5)
    withRule {
      assert(argmax.queryExecution.executedPlan.toString
        .contains("TopKPerGroup"))
      assert(global.queryExecution.executedPlan.toString
        .contains("TopKPerGroup"))
      assert(rows(argmax) === ea)
      assert(rows(global) === eg)
    }
  }

  test("non-rn conjuncts survive as a residual filter above the heap") {
    def q = Tables.part(spark, sf001)
      .select($"p_brand", $"p_partkey", $"p_retailprice",
        row_number().over(w).as("rn"))
      .filter($"rn" <= 3 && $"p_partkey" % 2 === 0)
      .select($"p_brand", $"p_partkey")
    val expected = rows(q)
    assert(expected.nonEmpty)
    withRule {
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup"), plan)
      assert(rows(q) === expected)
    }
  }

  test("rank-kept form stays with Spark's native WindowGroupLimit (no double rewrite)") {
    def q = Tables.part(spark, sf001)
      .select($"p_brand", $"p_partkey", $"p_retailprice",
        row_number().over(w).as("rn"))
      .filter($"rn" <= 3) // rn kept in output
    withRule {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerGroup"),
        s"rule must not stack on the native group-limit:\n$plan")
      assert(plan.contains("WindowGroupLimit"),
        s"expected the native rank-kept pruning:\n$plan")
    }
  }

  test("no-fire guards: rank(), lower bound, rn = 2, huge k") {
    val base = Tables.part(spark, sf001)
    withRule {
      // rank() admits >k ties — a k-heap would be wrong
      val rk = base.select($"p_brand", $"p_partkey", rank().over(w).as("rn"))
        .filter($"rn" <= 3).select($"p_brand", $"p_partkey")
      assert(!rk.queryExecution.executedPlan.toString
        .contains("TopKPerGroup"))
      // a lower bound cannot be dropped once rn is gone
      val lower = base.select($"p_brand", $"p_partkey",
          row_number().over(w).as("rn"))
        .filter($"rn" >= 2 && $"rn" <= 4).select($"p_brand", $"p_partkey")
      assert(!lower.queryExecution.executedPlan.toString
        .contains("TopKPerGroup"))
      // rn = 2 selects ONE row, not the top-2 prefix
      val eq2 = base.select($"p_brand", $"p_partkey",
          row_number().over(w).as("rn"))
        .filter($"rn" === 2).select($"p_brand", $"p_partkey")
      assert(!eq2.queryExecution.executedPlan.toString
        .contains("TopKPerGroup"))
      // k past MaxK — the native plan is the right one
      val huge = base.select($"p_brand", $"p_partkey",
          row_number().over(w).as("rn"))
        .filter($"rn" <= (RowNumberTopK.MaxK + 1)).select($"p_brand", $"p_partkey")
      assert(!huge.queryExecution.executedPlan.toString
        .contains("TopKPerGroup"))
    }
  }

  test("declared w11 under the installed rule plans through the heap operator") {
    withRule {
      val p = SparkEntry.queries("w11_topk_plain")(spark, sf001)
        .queryExecution.executedPlan.toString
      assert(p.contains("TopKPerGroup"), s"w11 kept the window plan:\n$p")
      assert(!p.contains("WindowGroupLimit"), p)
    }
  }

  test("fires on seeded random data and equals brute force (heavy groups)") {
    val rnd = new scala.util.Random(19)
    val df = (1 to 5000).map(i =>
      (rnd.nextInt(7), rnd.nextInt(100000), i.toLong)).toDF("g", "v", "id")
    val wr = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    def q = df.select($"g", $"v", $"id", row_number().over(wr).as("rn"))
      .filter($"rn" <= 10).select($"g", $"v", $"id")
    val expected = rows(q)
    assert(expected.size === 70)
    withRule {
      assert(q.queryExecution.executedPlan.toString
        .contains("TopKPerGroup"))
      assert(rows(q) === expected)
    }
  }
}
