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
}
