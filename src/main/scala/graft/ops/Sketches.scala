package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Probabilistic-sketch capabilities (SURVEY §2.8 "intentionally not
  * oracle-declared" tier — approximate by construction, so they are
  * bound-tested in `SketchSpec` instead of hash-compared):
  *
  *  - [[bloomPreFilter]]: the manual form of the runtime-filter / semi-join
  *    pushdown every warehouse does at scale — build a Bloom filter over
  *    the dim-side join keys (one pass, fixed bits), broadcast it, and
  *    drop non-matching fact rows BEFORE the shuffle. At 100 TB the win is
  *    shuffle VOLUME: a selective dim prunes most of the fact at the scan,
  *    and the exact join downstream removes the false positives, so the
  *    result is identical to the plain join (asserted). Spark's own
  *    `spark.sql.optimizer.runtime.bloomFilter.enabled` injects the same
  *    shape automatically when stats justify it; the explicit helper
  *    covers the cases the optimizer can't see (pre-aggregated dims,
  *    cross-query reuse of one built filter).
  *  - [[heavyHitters]]: Count-Min-Sketch heavy hitters — frequency
  *    estimates for hot keys in ONE pass with fixed memory (eps/confidence
  *    sized), the skew-DETECTION companion to [[Skew.saltedJoin]]'s
  *    mitigation: overestimates only, never misses a hot key.
  *
  * [[heavyHitters]] builds on `DataFrame.stat` (driver-side sketch object
  * of FIXED size; the aggregation itself is distributed with mergeable
  * partials). [[bloomPreFilter]] is built from Spark's own internal
  * runtime-filter expressions via `GraftBridge` (they are not in the
  * public function registry): `BloomFilterAggregate` builds the filter as
  * a distributed typed-imperative aggregate over `xxhash64(key)`, and
  * `BloomFilterMightContain` probes it as a NATIVE codegen predicate — the
  * pre-shuffle fact filter stays inside whole-stage codegen (round 8 rode
  * a Scala UDF here, which broke codegen on j17's hot path; PlanLintSpec
  * now asserts the UDF is gone).
  */
object Sketches {

  /** Exact join result, Bloom-pruned fact side: `fact ⋈ dim` on
    * `factKey = dimKey` where fact rows failing the dim-key Bloom test are
    * dropped before the join shuffle. `fpp` is the false-positive rate;
    * `expectedDim` (distinct dim keys) sizes the filter — pass ≤ 0 to
    * derive it from a dim-side count (a dimension-sized job). A hard-coded
    * capacity saturates silently once the dim outgrows it — fpp drifts
    * toward 1 and the pre-filter stops pruning with no error, exactly at
    * the scales it exists for — so deriving is the default posture.
    * Deriving alone is NOT sufficient (r9 advice): `BloomFilterAggregate`
    * internally clamps its item/bit arguments to the session's
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/`maxNumBits`
    * ceilings (defaults ~4M items / 67M bits), silently ignoring any
    * larger derived sizing — results stay correct (the exact join
    * follows) but pruning power decays. The helper therefore RAISES those
    * two session confs to cover the derived size before building, so the
    * sizing contract actually holds at the dim cardinalities it targets.
    *
    * Build and probe are Spark's own runtime-filter expressions (the
    * internal machinery behind `spark.sql.optimizer.runtime.bloomFilter`),
    * reached through `GraftBridge`: the filter is a distributed
    * `BloomFilterAggregate` over `xxhash64(dimKey)` (mergeable partials,
    * KB–MB result regardless of corpus), and the probe is the
    * `BloomFilterMightContain` codegen predicate over `xxhash64(factKey)`
    * — the fact-side filter runs inside whole-stage codegen at the scan.
    */
  def bloomPreFilter(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedDim: Long, fpp: Double): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    val n = if (expectedDim > 0) expectedDim else math.max(dim.count(), 64L)
    // optimal m = -n·ln(p)/ln²2 (standard Bloom sizing; same formula
    // BloomFilterAggregate's convenience ctor applies to its conf default)
    val numBits = math.ceil(
      -n.toDouble * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    // lift the aggregate's internal conf clamps to the derived sizing —
    // otherwise anything past ~4M items / 67M bits is silently truncated
    // and fpp drifts toward 1 with no error (see scaladoc)
    val sess = dim.sparkSession
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    // the lift is scoped to THIS build (r10 advice): the raised ceilings
    // would otherwise re-size Spark's own InjectRuntimeFilter blooms for
    // every later query in the session, so the prior values are restored
    // (or the keys unset) as soon as the filter bytes are materialized
    val prevItems = sess.conf.getOption(itemsKey)
    val prevBits = sess.conf.getOption(bitsKey)
    def lift(key: String, v: Long): Unit =
      if (sess.conf.getOption(key).forall(_.toLong < v))
        sess.conf.set(key, v.toString)
    val build = new BloomFilterAggregate(
      new XxHash64(Seq(GraftBridge.expression(col(dimKey)))),
      Literal(n), Literal(numBits)).toAggregateExpression()
    val bytes =
      try {
        lift(itemsKey, n)
        lift(bitsKey, numBits)
        dim.select(GraftBridge.column(build).as("bf"))
          .head().getAs[Array[Byte]](0)
      } finally {
        def restore(key: String, prev: Option[String]): Unit = prev match {
          case Some(v) => sess.conf.set(key, v)
          case None => sess.conf.unset(key)
        }
        restore(itemsKey, prevItems)
        restore(bitsKey, prevBits)
      }
    val probe = BloomFilterMightContain(Literal(bytes, BinaryType),
      new XxHash64(Seq(GraftBridge.expression(col(factKey)))))
    fact.filter(GraftBridge.column(probe))
      .join(dim, col(factKey) === col(dimKey))
  }

  /** Keys whose Count-Min estimate exceeds `minCount`, with the estimate.
    * CMS guarantees est ≥ true and est ≤ true + eps·N with the given
    * confidence, so every true heavy hitter survives; the caller
    * exact-counts the (few) survivors when exactness matters.
    */
  def heavyHitters(df: DataFrame, key: String, candidates: Seq[Long],
      eps: Double, confidence: Double, minCount: Long): Seq[(Long, Long)] = {
    val cms = df.stat.countMinSketch(key, eps, confidence, seed = 42)
    candidates.map(k => k -> cms.estimateCount(k)).filter(_._2 >= minCount)
  }

  // ---------------------------------------------------------------------
  // Oracle-DECLARED sketches (x35/x36). Unlike the capability tier above,
  // these two are deterministic end-to-end and hash-compared against the
  // DuckDB oracle: the sketch state is md5-derived integers aggregated by
  // ORDER-FREE operations (max / exact-dyadic sums / integer sums), so the
  // "approximation" is a pure function of the input SET — the same
  // registers on any engine, any partitioning. They grade the sketch
  // ALGEBRA as distributed keyed aggs, which is exactly what runs at
  // 100 TB (the capability tier's driver-side sketch objects do not).
  // ---------------------------------------------------------------------

  /** [[x35]]'s register count (m = 2⁸ → bucket = first md5 hex byte). */
  val HllM = 256

  /** x35 — HYPERLOGLOG distinct-user estimate per event type, oracle-exact:
    * the approximate-COUNT(DISTINCT) scale path beside a2's exact form
    * (whose count-distinct Expand doubles the shuffle). Register j keeps
    * max ρ over users hashing to bucket j (ρ = leading-zero rank of the
    * next 32 md5 bits) — ONE (type, bucket)-keyed max agg, ≤ m rows per
    * group at ANY corpus size, mergeable partials (max is order-free).
    * Estimate = α·m²/S with S = Σ 2^(−M_j): every 2^(−ρ) is an exactly-
    * representable dyadic and the 256-term sum stays ≤ 41 mantissa bits,
    * so S is EXACT — no float order-dependence anywhere; the final
    * α-formula and the small-range linear-counting branch
    * (E ≤ 2.5m ∧ zeros > 0 → m·ln(m/zeros)) are single fixed-shape double
    * expressions mirrored textually (x30's ln-parity precedent). The
    * exact n_users joins in for the relative-error column the declared
    * output exposes.
    */
  def x35(s: SparkSession, d: String): DataFrame = {
    val m = HllM
    val regs = Tables.events(s, d)
      .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
      .select(col("event_type"),
        expr("CAST(conv(substring(h, 1, 2), 16, 10) AS INT)").as("bucket"),
        expr("CAST(conv(substring(h, 3, 8), 16, 10) AS BIGINT)").as("v"))
      .groupBy("event_type", "bucket")
      .agg(max(expr(
        "CASE WHEN v = 0 THEN 33" +
          " ELSE 33 - length(conv(CAST(v AS STRING), 10, 2)) END"))
        .as("rho"))
    val perType = regs.groupBy("event_type")
      .agg(count(lit(1)).as("present"),
        sum(expr("power(CAST(2 AS DOUBLE), -CAST(rho AS DOUBLE))")).as("ssum"))
      .withColumn("zeros", lit(m) - col("present"))
      .withColumn("e_raw", expr(
        s"0.7213 / (1.0 + 1.079 / $m.0) * $m.0 * $m.0" +
          s" / (CAST(zeros AS DOUBLE) + ssum)"))
      .withColumn("hll_est", graft.Det.round4fast(expr(
        s"CASE WHEN e_raw <= 2.5 * $m.0 AND zeros > 0" +
          s" THEN $m.0 * ln($m.0 / CAST(zeros AS DOUBLE)) ELSE e_raw END")))
    val exact = Tables.events(s, d).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"))
    exact.join(perType, Seq("event_type"))
      .select(col("event_type"), col("n_users"), col("hll_est"),
        graft.Det.round4nz((col("hll_est") - col("n_users"))
          / col("n_users").cast("double")).as("rel_err"))
      .orderBy("event_type")
  }

  /** [[x36]]'s width (columns per hash row; d = 4 rows). */
  val CmsW = 1024

  /** x36 — COUNT-MIN heavy hitters, oracle-exact: frequency estimates for
    * the top-20 corpus words through a 4×1024 CMS — est = min over 4 rows
    * of the hashed cell's sum, guaranteed ≥ true count, within ε·N w.h.p.
    * The sketch is built FROM the vocabulary-level count agg (l7's shape:
    * corpus explode → word-keyed sum), so the register table is ≤ 4·1024
    * rows of exact integer sums — order-free, mergeable, fixed-size at any
    * corpus scale — and the declared output exposes estimate vs truth
    * (overcount = collided mass). Top-20 selection is
    * TakeOrderedAndProject with the (cnt DESC, word) tie-break (D6).
    */
  def x36(s: SparkSession, d: String): DataFrame = {
    val wc = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val cells = wc
      .select(col("cnt"), explode(array((0 until 4).map { i =>
        struct(lit(i).as("r"),
          expr(s"CAST(conv(substring(md5(concat('$i:', w)), 1, 8), 16, 10)" +
            s" AS BIGINT) % $CmsW").as("c"))
      }: _*)).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(sum(col("cnt")).as("reg"))
    val top = wc.orderBy(col("cnt").desc, col("w")).limit(20)
    val probes = top.select(col("w"), col("cnt"),
      explode(array((0 until 4).map { i =>
        struct(lit(i).as("r"),
          expr(s"CAST(conv(substring(md5(concat('$i:', w)), 1, 8), 16, 10)" +
            s" AS BIGINT) % $CmsW").as("c"))
      }: _*)).as("rc"))
      .select(col("w"), col("cnt"), col("rc.r").as("pr"), col("rc.c").as("pc"))
    probes.join(cells, col("pr") === col("r") && col("pc") === col("c"))
      .groupBy(col("w"), col("cnt"))
      .agg(min(col("reg")).as("cms_est"))
      .select(col("w"), col("cnt").as("true_cnt"), col("cms_est"),
        (col("cms_est") - col("cnt")).as("overcount"))
      .orderBy(col("true_cnt").desc, col("w"))
  }

  /** x73 — APPROX-PERCENTILE gate (x67's estimate-vs-exact pattern on the
    * quantile sketch): per event type, the exact interpolated p50/p95 of
    * the 2-dp metric value (s19's declared card) PLUS an in-band flag for
    * `approx_percentile` — the documented 100 TB swap for s19/x62's exact
    * percentiles (a KLL/GK mergeable sketch of fixed size per group vs an
    * exact percentile that buffers the group). The band is the sketch's
    * own CONTRACT restated in exact terms: accuracy 10⁴ bounds the rank
    * error at 10⁻⁴·n, so the returned p50 is a true element between the
    * exact 45th and 55th percentiles (p95 between the 90th and 99th) for
    * any n ≥ 100 — groups below 100 rows auto-pass, because at that size
    * production runs the exact path anyway and interpolation-vs-element
    * discretization can cross the band edge. The estimate itself stays
    * OUT of the hash (only the flag is graded — x44/x67's
    * declared-tolerance discipline); the oracle states the flags as the
    * constant 1, so a sketch drifting past its contract fails the gate
    * instead of shipping silently.
    *
    * Scale: one type-keyed agg; the exact percentiles are the oracle-
    * checkable declaration (s19's caveat), the sketch rides the same
    * shuffle with O(accuracy) state per group. Exact values 6-dp rounded
    * like s19 (D4); flags are integers.
    */
  def x73(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        graft.Det.dec2(col("value")).cast("double").as("v"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        round(percentile(col("v"), lit(0.5)), 6).as("p50"),
        round(percentile(col("v"), lit(0.95)), 6).as("p95"),
        percentile(col("v"), lit(0.45)).as("lo50"),
        percentile(col("v"), lit(0.55)).as("hi50"),
        percentile(col("v"), lit(0.90)).as("lo95"),
        percentile(col("v"), lit(0.99)).as("hi95"),
        percentile_approx(col("v"), lit(0.5), lit(10000)).as("ap50"),
        percentile_approx(col("v"), lit(0.95), lit(10000)).as("ap95"))
      .select(col("event_type"), col("n_events"), col("p50"), col("p95"),
        when(col("n_events") < 100
          || (col("ap50") >= col("lo50") && col("ap50") <= col("hi50")), 1)
          .otherwise(0).as("p50_in_band"),
        when(col("n_events") < 100
          || (col("ap95") >= col("lo95") && col("ap95") <= col("hi95")), 1)
          .otherwise(0).as("p95_in_band"))
      .orderBy("event_type")
}
