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

  test("no-fire guards: lower bound, rn = 2, huge k") {
    val base = Tables.part(spark, sf001)
    withRule {
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

  test("declared w12 under the installed rule plans through the Rank ties mode") {
    withRule {
      val df = SparkEntry.queries("w12_topk_ties")(spark, sf001)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("TopKPerGroup"), s"w12 kept the window plan:\n$p")
      assert(!p.contains("WindowGroupLimit"), p)
      val modes = df.queryExecution.optimizedPlan.collect {
        case t: graft.plans.TopKPerGroupNode => t.ties
      }
      assert(modes === Seq(graft.plans.TopKTies.Rank), s"wrong ties mode: $modes")
    }
  }

  test("declared w13 under the installed rule plans through the Dense ties mode") {
    withRule {
      val df = SparkEntry.queries("w13_topk_dense")(spark, sf001)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("TopKPerGroup"), s"w13 kept the window plan:\n$p")
      val modes = df.queryExecution.optimizedPlan.collect {
        case t: graft.plans.TopKPerGroupNode => t.ties
      }
      assert(modes === Seq(graft.plans.TopKTies.Dense), s"wrong ties mode: $modes")
    }
  }

  test("drop-rank rank() <= k fires in Rank ties mode and keeps boundary ties") {
    // deliberately NON-total order (retailprice only): rank() must keep
    // every row tied at the k boundary — the semantics round 10's heap
    // could not express (it no-fired on rank; round 11's RankClasses can)
    val wTies = Window.partitionBy($"p_brand").orderBy($"p_retailprice".desc)
    def q = Tables.part(spark, sf001)
      .select($"p_brand", $"p_partkey", $"p_retailprice",
        rank().over(wTies).as("rn"))
      .filter($"rn" <= 3)
      .select($"p_brand", $"p_partkey", $"p_retailprice")
    val expected = rows(q)
    assert(expected.nonEmpty)
    withRule {
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup"), s"rank form did not fire:\n$plan")
      assert(!plan.contains("Window"), s"window assembly should be gone:\n$plan")
      assert(rows(q) === expected)
    }
  }

  test("rank/dense_rank forms equal brute force on tie-heavy random data") {
    val rnd = new scala.util.Random(23)
    // v drawn from a TINY domain so boundary ties are dense and groups
    // routinely emit far more than k rows (the tie-preserving contract)
    val df = (1 to 4000).map(i =>
      (rnd.nextInt(5), rnd.nextInt(12), i.toLong)).toDF("g", "v", "id")
    val wr = Window.partitionBy($"g").orderBy($"v".desc)
    def qr = df.select($"g", $"v", $"id", rank().over(wr).as("rn"))
      .filter($"rn" <= 7).select($"g", $"v", $"id")
    def qd = df.select($"g", $"v", $"id", dense_rank().over(wr).as("rn"))
      .filter($"rn" <= 3).select($"g", $"v", $"id")
    val (er, ed) = (rows(qr), rows(qd))
    // dense_rank <= 3 keeps the 3 largest distinct v per group — with 12
    // values over 800 rows/group that is ≈ 200 rows, far beyond k
    assert(ed.size > 100, s"fixture not tie-heavy enough: ${ed.size}")
    withRule {
      for ((q, expected, tag) <- Seq((qr, er, "rank"), (qd, ed, "dense_rank"))) {
        val plan = q.queryExecution.executedPlan.toString
        assert(plan.contains("TopKPerGroup"), s"$tag did not fire:\n$plan")
        assert(rows(q) === expected, tag)
      }
    }
  }

  test("rank() = 1 keeps ALL argmax ties (equality fires at k = 1)") {
    val df = Seq((1, 10, 1L), (1, 10, 2L), (1, 5, 3L),
      (2, 7, 4L), (2, 7, 5L), (2, 7, 6L)).toDF("g", "v", "id")
    val wr = Window.partitionBy($"g").orderBy($"v".desc)
    def q = df.select($"g", $"v", $"id", rank().over(wr).as("rn"))
      .filter($"rn" === 1).select($"g", $"id")
    withRule {
      assert(q.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
      assert(rows(q) === Seq("[1,1]", "[1,2]", "[2,4]", "[2,5]", "[2,6]"))
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
