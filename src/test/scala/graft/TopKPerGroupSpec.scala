package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopKPerGroup

/** The custom TopKPerGroup operator vs the window formulation. */
class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  test("matches the window-based top-3 per brand (w2 semantics)") {
    val part = Tables.part(spark, sf001)
    val custom = TopKPerGroup(part, Seq("p_brand"),
      Seq(("p_retailprice", true), ("p_partkey", false)), 3)
      .select("p_brand", "p_partkey", "p_retailprice")
      .orderBy("p_brand", "p_partkey")
      .collect().toSeq
    val w = Window.partitionBy("p_brand")
      .orderBy($"p_retailprice".desc, $"p_partkey")
    val windowed = part.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select("p_brand", "p_partkey", "p_retailprice")
      .orderBy("p_brand", "p_partkey")
      .collect().toSeq
    assert(custom == windowed)
  }

  test("plans as partial+final with one exchange and no sort of the input") {
    val df = TopKPerGroup(Tables.part(spark, sf001), Seq("p_brand"),
      Seq(("p_retailprice", true), ("p_partkey", false)), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    assert("TopKPerGroup \\[".r.findAllIn(plan).size == 2, s"expected 2 phases:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Sort "), s"input should not be globally sorted:\n$plan")
  }

  test("handles k larger than group size and empty input") {
    val tiny = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("g", "v")
    val all = TopKPerGroup(tiny, Seq("g"), Seq(("v", false)), 10)
      .orderBy("g", "v").as[(String, Int)].collect().toSeq
    assert(all == Seq(("a", 1), ("a", 2), ("b", 3)))
    val empty = TopKPerGroup(tiny.filter($"v" > 100), Seq("g"), Seq(("v", false)), 2)
    assert(empty.count() === 0)
  }

  test("global top-k when no group columns") {
    val top = TopKPerGroup(Tables.part(spark, sf001), Seq(),
      Seq(("p_retailprice", true), ("p_partkey", false)), 5)
      .select("p_partkey")
      .collect().map(_.getLong(0)).toSet
    val expected = Tables.part(spark, sf001)
      .orderBy($"p_retailprice".desc, $"p_partkey").limit(5)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(top == expected)
  }

  test("Rank ties mode equals the rank() window across many partitions") {
    // tie-dense tiny value domain; repartition(7) exercises the partial
    // phase (per-partition class trim must never drop a global boundary tie)
    val rnd = new scala.util.Random(31)
    val df = (1 to 3000).map(i =>
      (rnd.nextInt(6).toString, rnd.nextInt(10), i.toLong))
      .toDF("g", "v", "id").repartition(7)
    val custom = TopKPerGroup(df, Seq("g"), Seq(("v", true)), 4,
        graft.plans.TopKTies.Rank)
      .select("g", "v", "id").collect().map(_.toString).sorted.toSeq
    val w = Window.partitionBy("g").orderBy($"v".desc)
    val windowed = df.withColumn("rn", rank().over(w)).filter($"rn" <= 4)
      .select("g", "v", "id").collect().map(_.toString).sorted.toSeq
    assert(custom == windowed)
    // the contract: boundary ties make output exceed k·groups
    assert(windowed.size > 4 * 6, s"fixture not tie-heavy: ${windowed.size}")
  }

  test("Dense ties mode equals the dense_rank() window across many partitions") {
    val rnd = new scala.util.Random(37)
    val df = (1 to 3000).map(i =>
      (rnd.nextInt(4).toString, rnd.nextInt(15), i.toLong))
      .toDF("g", "v", "id").repartition(5)
    val custom = TopKPerGroup(df, Seq("g"), Seq(("v", true)), 3,
        graft.plans.TopKTies.Dense)
      .select("g", "v", "id").collect().map(_.toString).sorted.toSeq
    val w = Window.partitionBy("g").orderBy($"v".desc)
    val windowed = df.withColumn("rn", dense_rank().over(w)).filter($"rn" <= 3)
      .select("g", "v", "id").collect().map(_.toString).sorted.toSeq
    assert(custom == windowed)
    assert(windowed.size > 3 * 4, s"fixture not tie-heavy: ${windowed.size}")
  }

  test("tie modes: global (no-group) and k-larger-than-distinct edges") {
    val df = Seq(("a", 5), ("b", 5), ("c", 3), ("d", 3), ("e", 1))
      .toDF("id", "v").repartition(3)
    // global rank <= 1 keeps both argmax ties
    val r1 = TopKPerGroup(df, Seq(), Seq(("v", true)), 1,
      graft.plans.TopKTies.Rank).select("id").collect().map(_.getString(0)).toSet
    assert(r1 == Set("a", "b"))
    // global rank <= 3: ranks are 1,1,3,3,5 → keeps the four ≤ 3
    val r3 = TopKPerGroup(df, Seq(), Seq(("v", true)), 3,
      graft.plans.TopKTies.Rank).select("id").collect().map(_.getString(0)).toSet
    assert(r3 == Set("a", "b", "c", "d"))
    // dense_rank <= 3 keeps all three distinct values = everything
    val d3 = TopKPerGroup(df, Seq(), Seq(("v", true)), 3,
      graft.plans.TopKTies.Dense).select("id").collect().map(_.getString(0)).toSet
    assert(d3 == Set("a", "b", "c", "d", "e"))
    // k beyond distinct count keeps everything too
    val d9 = TopKPerGroup(df, Seq(), Seq(("v", true)), 9,
      graft.plans.TopKTies.Dense).count()
    assert(d9 === 5)
  }

  test("global top-k over a multi-partition input emits exactly k rows") {
    // Regression: the final phase must require AllTuples when there are no
    // group keys; with UnspecifiedDistribution each partition emitted its own
    // k rows (k=3 over 4 partitions returned 12 rows).
    val multi = Tables.part(spark, sf001).repartition(4)
    val got = TopKPerGroup(multi, Seq(),
      Seq(("p_retailprice", true), ("p_partkey", false)), 3)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val expected = Tables.part(spark, sf001)
      .orderBy($"p_retailprice".desc, $"p_partkey").limit(3)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(got.size == 3, s"expected exactly 3 rows, got ${got.size}")
    assert(got == expected)
  }

  test("maxGroupRows metric surfaces a skewed Dense tier (max-merged, not summed)") {
    // round-11 ADVICE item 4: Dense's per-value multiplicity is unbounded —
    // a skewed top tier buffers every row of that tier with no spill path.
    // The metric must record the high-water mark so the pressure shows in
    // the SQL UI. 400 rows share the single top value in one group; other
    // groups stay tiny; input spread over 6 partitions so the driver-side
    // merge across tasks must take MAX (a sum-merged metric would read the
    // per-partition slices of the hot tier summed ≈ right here, but would
    // also sum across groups/tasks generally — the final phase sees the
    // whole 400-row tier in ONE group state, which is the asserted bound).
    val hot = (1 to 400).map(i => ("hot", 99, i.toLong))
    val cold = (1 to 50).map(i => (s"g${i % 5}", i % 7, 1000L + i))
    val df = (hot ++ cold).toDF("g", "v", "id").repartition(6)
    // AQE hides executed stages behind leaf QueryStageExec wrappers, which
    // would hide the exec nodes (and their metric instances) from collect;
    // the metric itself is AQE-agnostic, so assert on the plain plan.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val q = TopKPerGroup(df, Seq("g"), Seq(("v", true)), 1,
        graft.plans.TopKTies.Dense)
      // execute THIS query execution (count() would plan its own, pruned one)
      assert(q.collect().length >= 400)
      val execs = q.queryExecution.executedPlan.collect {
        case t: graft.plans.TopKPerGroupExec => t
      }
      assert(execs.size === 2, "expected partial+final TopKPerGroupExec pair")
      val finalMax = execs.find(!_.partial).get.metrics("maxGroupRows").value
      assert(finalMax === 400L,
        s"final phase must see the whole hot tier in one group state: $finalMax")
      // partial phase: no task holds more than its partition's share, and the
      // max-merge keeps the largest single-task watermark (≤ 400, > 0)
      val partMax = execs.find(_.partial).get.metrics("maxGroupRows").value
      assert(partMax > 0L && partMax <= 400L, s"partial watermark: $partMax")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
}
