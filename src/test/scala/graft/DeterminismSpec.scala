package graft

/** Whole-surface determinism at an ALTERNATE parallelism: every declared
  * query is collected once at the suite default shuffle width (4) and once
  * at a co-prime width (7); the runs must agree under BOTH structural
  * row equality AND the row's canonical string repr. The repr compare is
  * the load-bearing one: it mirrors the driver's repr-based hash, so the
  * divergences numeric == waves through still fail here (-0.0 vs 0.0,
  * Decimal 1.50 vs 1.5), while NaN vs NaN reprs equal and passes on both.
  *
  * The shuffle width is the lever that actually permutes partial-
  * aggregation and merge order — the place an order-dependent double agg
  * (the flake class the decimal D2 rules exist for) changes its answer.
  * (`local[7]` itself cannot be tested here: one JVM holds one
  * SparkContext, so the master is pinned by the shared suite session;
  * thread count only changes task scheduling, while the shuffle width
  * changes the data placement that a nondeterministic query leaks.)
  *
  * The per-query determinism double-run in OperatorSpec re-runs the 22
  * riskiest queries at the SAME width to catch run-to-run flake; this
  * suite is the cross-WIDTH pass over the full surface, so a new query
  * with a hidden partitioning dependence fails CI even if nobody thought
  * to add it to the risky list.
  */
class DeterminismSpec extends SparkSpec {

  test("all declared queries byte-equal at shuffle width 7 vs 4") {
    val shufP = spark.conf.get("spark.sql.shuffle.partitions")
    val diffs = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val base = fn(spark, sf001).collect().toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val alt =
        try fn(spark, sf001).collect().toSeq
        finally spark.conf.set("spark.sql.shuffle.partitions", shufP)
      if (base == alt && base.map(_.toString) == alt.map(_.toString)) None
      else Some(name)
    }
    assert(diffs.isEmpty,
      s"partitioning-dependent results: ${diffs.mkString(", ")}")
  }
}
