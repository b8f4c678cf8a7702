package graft

/** Whole-surface determinism at an ALTERNATE parallelism: every declared
  * query is collected once at the suite default shuffle width (4) and once
  * at a co-prime width (7), and the two results must be byte-equal
  * (boxed-equality on every value — stricter than SQL equality: NaN vs NaN
  * passes but -0.0 vs 0.0 and 1.50 vs 1.5 decimals fail).
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
      if (base == alt) None else Some(name)
    }
    assert(diffs.isEmpty,
      s"partitioning-dependent results: ${diffs.mkString(", ")}")
  }
}
