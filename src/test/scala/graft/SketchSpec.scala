package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** Sketch capabilities: exactness where promised (Bloom pre-filter result
  * parity — no false NEGATIVES by construction), bounds where approximate
  * (CMS one-sided error).
  */
class SketchSpec extends SparkSpec {

  test("bloom pre-filtered join equals the plain join exactly") {
    // selective dim: suppliers of one nation — the shape where the
    // pre-filter pays (most fact rows dropped before the shuffle)
    val fact = Tables.lineitem(spark, sf001)
      .select(col("l_suppkey"), col("l_orderkey"))
    val dim = Tables.supplier(spark, sf001)
      .filter(col("s_nationkey") === 3)
      .select(col("s_suppkey"), col("s_nationkey"))
    val pre = Sketches.bloomPreFilter(fact, dim, "l_suppkey", "s_suppkey",
        expectedDim = 1000L, fpp = 0.03)
      .select("l_orderkey", "l_suppkey").orderBy("l_orderkey", "l_suppkey")
    val plain = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
      .select("l_orderkey", "l_suppkey").orderBy("l_orderkey", "l_suppkey")
    val p = pre.collect().toSeq
    assert(p == plain.collect().toSeq)
    assert(p.nonEmpty)
  }

  test("bloomPreFilter's conf lift is scoped: session clamps restored after the build") {
    // r10 advice: the lift used to stick for the rest of the session,
    // re-sizing Spark's own InjectRuntimeFilter blooms and racing across
    // concurrent sessions. The build now restores the prior ceilings.
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val (prevItems, prevBits) =
      (spark.conf.getOption(itemsKey), spark.conf.getOption(bitsKey))
    val fact = Tables.lineitem(spark, sf001).select(col("l_suppkey"), col("l_orderkey"))
    val dim = Tables.supplier(spark, sf001)
      .filter(col("s_nationkey") === 3).select(col("s_suppkey"))
    // a derived sizing far above the ~4M-item default clamp forces a lift
    Sketches.bloomPreFilter(fact, dim, "l_suppkey", "s_suppkey",
      expectedDim = 50_000_000L, fpp = 0.03).count()
    assert(spark.conf.getOption(itemsKey) === prevItems,
      "maxNumItems lift leaked past the build")
    assert(spark.conf.getOption(bitsKey) === prevBits,
      "maxNumBits lift leaked past the build")
  }

  test("bloom filter actually prunes: filtered fact is a small superset of matches") {
    val fact = Tables.lineitem(spark, sf001).select(col("l_suppkey"))
    val dim = Tables.supplier(spark, sf001)
      .filter(col("s_nationkey") === 3).select(col("s_suppkey"))
    val bf = dim.stat.bloomFilter("s_suppkey", 1000L, 0.03)
    val mightContain = udf((k: Long) => bf.mightContainLong(k))
    val kept = fact.filter(mightContain(col("l_suppkey"))).count()
    val trueMatches = fact.join(dim, col("l_suppkey") === col("s_suppkey")).count()
    val total = fact.count()
    assert(kept >= trueMatches)          // no false negatives
    assert(kept < total / 2, s"pre-filter kept $kept of $total — not selective")
  }

  test("count-min heavy hitters: one-sided bound, no missed hot key") {
    val exact = Tables.lineitem(spark, sf001)
      .groupBy("l_suppkey").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val eps = 0.01
    val candidates = exact.keys.toSeq.sorted
    val est = Sketches.heavyHitters(
      Tables.lineitem(spark, sf001), "l_suppkey", candidates,
      eps, 0.99, minCount = 1L).toMap
    // every true count is covered and never underestimated; overestimate
    // bounded by eps * N (the CMS guarantee at 99% confidence — generous
    // slack keeps the probabilistic test deterministic in practice)
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"CMS underestimated $k")
      assert(est(k) <= c + (2 * eps * n).toLong, s"CMS overestimate of $k too large")
    }
  }
}
