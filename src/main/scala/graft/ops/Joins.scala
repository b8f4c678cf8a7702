package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Det._

/** Join queries (SURVEY.md §2.2) — the heart of the reference [RECON: the
  * reference implements each of these as hand-coded reduce-side repartition
  * joins or map-side (distributed-cache) joins; here the join strategy is
  * Catalyst's choice, with explicit `broadcast()` hints where a dimension is
  * known-small — the declarative twin of the reference's map-side join].
  *
  * Scale notes: every equi-join below keys the shuffle on the join column, so
  * at 100 TB the plan is shuffle-hash/sort-merge with AQE skew splitting;
  * dimension tables (region/nation/part/supplier at TPC-H ratios) stay
  * broadcast-able far beyond sf1k.
  */
object Joins {

  /** Monotone suffix for per-call temp-view names (j11) — keeps SQL-text
    * queries from mutating a shared catalog name under concurrent callers.
    */
  private val viewSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** j1 — inner equi-join fact→dim. */
  def j1(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"), col("o_totalprice"))
      .orderBy("o_orderkey")

  /** j2 — explicit broadcast joins against two small dims (map-side join twin). */
  def j2(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("p_name"), col("s_name"))
      // full-output-column sort: (okey, lnum) is not unique in the fixture
      .orderBy("l_orderkey", "l_linenumber", "p_name", "s_name")

  /** j3 — TPC-H-Q5-style 5-way star join, revenue per nation in ASIA/1996.
    * Join order: fact first, dims chained smallest-last so Catalyst can
    * broadcast nation/region and AQE can re-plan the two big joins.
    */
  def j3(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      // range form (not year()=) so the predicate pushes into the parquet scan
      .filter(col("r_name") === "ASIA"
        && col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01")
      .groupBy(col("n_name"))
      .agg(out4(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))).as("revenue"),
        count(lit(1)).as("line_cnt"))
      .orderBy("n_name")

  /** j4 — left outer join + count of the nullable side. */
  def j4(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("order_cnt"))
      .orderBy("c_custkey")

  /** j5 — left-semi join (EXISTS): customers with at least one open order. */
  def j5(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")

  /** j6 — left-anti join (NOT EXISTS / SPARQL OPTIONAL+!bound [RECON]):
    * customers with no 1995 order.
    */
  def j6(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1996-01-01"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy("c_custkey")

  /** j7 — full outer join of per-nation customer/supplier counts (D5: the
    * output key is made non-null with coalesce so ordering is portable).
    */
  def j7(s: SparkSession, d: String): DataFrame = {
    val cn = Tables.customer(s, d).groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("cust_cnt"))
    val sn = Tables.supplier(s, d).groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("supp_cnt"))
    cn.join(sn, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        col("cust_cnt"), col("supp_cnt"))
      .orderBy("nationkey")
  }

  /** j8 — theta (non-equi range) join → BroadcastNestedLoopJoin; bounded by
    * the tiny build side, which is the only safe shape for NLJ at scale.
    */
  def j8(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d)
      .join(Tables.nation(s, d), col("r_regionkey") < col("n_regionkey"))
      .select(col("r_regionkey"), col("n_nationkey"), col("r_name"), col("n_name"))
      .orderBy("r_regionkey", "n_nationkey")

  /** j9 — as-of join: latest signup at-or-before each purchase of the same
    * user. No native as-of in Spark; formulated as union+window: signup and
    * purchase rows interleave in one per-user event stream ordered by
    * (ts, kind, event_id) — signups sort before an equal-ts purchase so
    * `<=` semantics hold, and equal-ts signups resolve to the max event_id —
    * and `last(signup, ignoreNulls)` over the running frame carries the
    * as-of signup to each purchase row. ONE keyed shuffle (the window
    * partition), no join: a user with thousands of signups costs rows, not
    * rows × matches, unlike the join+row_number formulation.
    */
  def j9(s: SparkSession, d: String): DataFrame = {
    // µs protocol: DuckDB ≤1.0 truncates ns-parquet to µs on read, so all
    // event-time comparison/output here is µs (ts div 1000 ≡ epoch_us(ts)).
    val e = Tables.events(s, d)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"),
        when(col("event_type") === "signup", 0).otherwise(1).as("kind"))
      .withColumn("sg", when(col("kind") === 0,
        struct(col("ts_us").as("signup_ts"), col("event_id").as("signup_event_id"))))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("last_sg", last(col("sg"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1 && col("last_sg").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts_us").as("purchase_ts"),
        col("last_sg.signup_event_id").as("signup_event_id"),
        col("last_sg.signup_ts").as("signup_ts"))
      .orderBy("event_id")
  }

  /** j10 — small cross join (bounded: 5×25). */
  def j10(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d).crossJoin(Tables.nation(s, d))
      .select(col("r_regionkey"), col("n_nationkey"), col("r_name"), col("n_name"))
      .orderBy("r_regionkey", "n_nationkey")

  /** j11 — correlated scalar subqueries: orders strictly above their
    * customer's average price. Exercises Catalyst's subquery decorrelation
    * (both correlated aggregates rewrite to one aggregate + join — check
    * `.explain`: no per-row subquery execution survives). The average is
    * compared multiplicatively (`price × count > sum`) so the math stays in
    * exact decimals end-to-end — an avg would force an engine-specific
    * decimal-division scale.
    */
  def j11(s: SparkSession, d: String): DataFrame = {
    // Correlated scalar subqueries are SQL-text-only, which forces a view;
    // a per-call unique name (dropped immediately after the eager analysis
    // inside sql()) keeps this function free of shared-catalog side effects.
    val v = s"orders_j11_${Joins.viewSeq.incrementAndGet()}"
    Tables.orders(s, d).createOrReplaceTempView(v)
    try s.sql(s"""SELECT o_orderkey, o_custkey, o_totalprice FROM $v o
             WHERE CAST(o_totalprice AS DECIMAL(18,2))
                 * (SELECT COUNT(*) FROM $v i WHERE i.o_custkey = o.o_custkey)
               > (SELECT SUM(CAST(i.o_totalprice AS DECIMAL(18,2)))
                  FROM $v i WHERE i.o_custkey = o.o_custkey)
             ORDER BY o_orderkey""")
    finally s.catalog.dropTempView(v)
  }

  /** j12 — LATERAL correlated TABLE subquery (row-returning, vs j11's
    * scalars): per nation, its top-3 customers by account balance through
    * `LATERAL (... WHERE c_nationkey = n_nationkey ORDER BY ... LIMIT 3)`.
    * Catalyst decorrelates the per-row LIMIT into a rank-window over ONE
    * keyed join (`.explain`: a window + filter ≤ 3, no per-outer-row
    * re-execution) — the same plan w2's explicit window writes by hand, so
    * the lateral form scales identically. Balances are value copies (no
    * arithmetic) with a c_custkey tie-break — exact parity (w7's rule).
    */
  def j12(s: SparkSession, d: String): DataFrame = {
    val nv = s"nation_j12_${Joins.viewSeq.incrementAndGet()}"
    val cv = s"customer_j12_${Joins.viewSeq.incrementAndGet()}"
    Tables.nation(s, d).createOrReplaceTempView(nv)
    Tables.customer(s, d).createOrReplaceTempView(cv)
    try s.sql(s"""SELECT n_name, t.c_custkey, t.c_acctbal
             FROM $nv,
             LATERAL (SELECT c_custkey, c_acctbal FROM $cv
                      WHERE c_nationkey = n_nationkey
                      ORDER BY c_acctbal DESC, c_custkey LIMIT 3) t
             ORDER BY n_name, t.c_custkey""")
    finally { s.catalog.dropTempView(nv); s.catalog.dropTempView(cv) }
  }

  /** j13 — SALTED skew join, declared: per-nation supplier revenue through
    * [[Skew.saltedJoin]] (lineitem ⋈ supplier on suppkey, salt derived
    * from l_orderkey, dim replicated ×8). The salting is a PLAN property —
    * the result is identical to the plain equi-join, which is exactly what
    * the oracle states — so this query pins the skew-mitigation machinery
    * to the correctness gate: a salting bug (NULL salt drop, uneven
    * replica, residue mismatch) breaks the hash compare instead of hiding
    * in a capability test. At 100 TB this is the shape for a single
    * dominant key that AQE's split-partition remedy can't spread (every
    * split still holds only that key): the hot key's rows land on 8 tasks
    * keyed by (suppkey, salt) while the dim side pays ×8 rows — dim-sized,
    * not corpus-sized. Decimal revenue sum (D2), one keyed rollup above
    * the join.
    */
  def j13(s: SparkSession, d: String): DataFrame =
    Skew.saltedJoin(
        Tables.lineitem(s, d).select(col("l_suppkey"), col("l_orderkey"),
          col("l_extendedprice")),
        Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
        "l_suppkey", "s_suppkey", col("l_orderkey"), 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("line_cnt"),
        out2(sum(dec2(col("l_extendedprice")))).as("revenue"))
      .orderBy("s_nationkey")

  /** j14 — blocked EDIT-DISTANCE fuzzy join: per part, the count of same-
    * brand parts whose name is within Levenshtein distance 3 (and not
    * byte-equal), plus the closest distance — the fuzzy-matching primitive
    * of entity resolution / catalog dedup. Never all-pairs: candidates are
    * generated by an equi-join on the BLOCKING KEY (`p_brand` — the
    * Ed-Join-family discipline; swap in a q-gram or length-band key for
    * unblocked corpora), and the O(len²) DP only runs after the cheap
    * length prefilter `|len(a)−len(b)| ≤ 3` (an edit distance is at least
    * the length gap, so the filter is exact, not a heuristic). Levenshtein
    * is Spark's codegen'd builtin — unit-cost DP, same contract as the
    * oracle's `levenshtein`. Output is per-part (corpus-linear), not the
    * pair set.
    */
  def j14(s: SparkSession, d: String): DataFrame = {
    // Ed-Join's other classic move, applied first: DEDUPE THE JOIN KEYS.
    // The DP only ever sees distinct (brand, name) groups — the corpus
    // contributes one keyed agg and a broadcast join back, so the
    // quadratic term runs on the name VOCABULARY (1.6k groups at sf0.1,
    // grows ~log with the catalog), not the part count. The first cut
    // joined raw parts (16M levenshtein evals at sf0.1, 13.3 s); this
    // shape does 100k (0.6 s) for the identical result.
    val p = Tables.part(s, d).select(col("p_partkey"), col("p_brand"), col("p_name"))
    val groups = p.groupBy(col("p_brand"), col("p_name"))
      .agg(count(lit(1)).as("cnt"))
    val b = groups.select(col("p_brand").as("b2"), col("p_name").as("n2"),
      col("cnt").as("c2"))
    val nameSims = groups
      .join(b, col("p_brand") === col("b2") && col("p_name") =!= col("n2"))
      .filter(abs(length(col("p_name")) - length(col("n2"))) <= 3)
      .withColumn("dist", levenshtein(col("p_name"), col("n2")))
      .filter(col("dist") <= 3)
      .groupBy(col("p_brand"), col("p_name"))
      .agg(sum(col("c2")).as("n_sim"), min(col("dist")).cast("int").as("min_dist"))
    p.join(nameSims, Seq("p_brand", "p_name"))
      .select(col("p_partkey"), col("p_brand"), col("p_name"),
        col("n_sim"), col("min_dist"))
      .orderBy("p_partkey")
  }

  /** [[j15]]'s time-axis bin width in days. Must exceed the max interval
    * length (50: `l_quantity` ≤ 50 days) so every interval spans ≤ 2 bins
    * and the explode is O(1) per row; mirrored nowhere — the oracle states
    * the plain overlap predicate and binning is pure plan strategy.
    */
  val IntervalBinDays = 64

  /** j15 — INTERVAL OVERLAP self-join: per part, how many pairs of
    * shipments from DIFFERENT suppliers had overlapping transit windows
    * `[shipdate, shipdate + quantity days]` — the range-join shape (event
    * intervals, validity windows, genomic ranges) Spark has no native
    * operator for. The naive formulation is a theta-join (quadratic per
    * part); instead the time axis is cut into [[IntervalBinDays]]-day bins,
    * each interval is exploded to the ≤2 bins it touches, candidates meet
    * in an EQUI-join on (part, bin), and a pair is counted only in the bin
    * owning `max(start₁, start₂)` — both intervals of an overlapping pair
    * provably cover that point, so the ownership test deduplicates without
    * a DISTINCT (x1's first-collision discipline). Shuffle volume is
    * corpus-linear at any scale; per-(part, bin) group size is bounded by
    * shipment density per part-bin, not corpus size. Oracle states the
    * plain overlap theta-join.
    */
  def j15(s: SparkSession, d: String): DataFrame = {
    val B = IntervalBinDays
    val li = Tables.lineitem(s, d).select(
      col("l_partkey").as("pk"), col("l_orderkey").as("ok"),
      col("l_linenumber").as("ln"), col("l_suppkey").as("sk"),
      datediff(col("l_shipdate").cast("date"), lit("1992-01-01").cast("date"))
        .as("st"),
      col("l_quantity").cast("int").as("qdays"))
      .withColumn("en", col("st") + col("qdays")).drop("qdays")
    val binned = li.withColumn("bin", explode(expr(s"sequence(st DIV $B, en DIV $B)")))
    val right = binned.select(col("pk").as("pk2"), col("bin").as("bin2"),
      col("ok").as("ok2"), col("ln").as("ln2"), col("sk").as("sk2"),
      col("st").as("st2"), col("en").as("en2"))
    // SHUFFLE_HASH pinned: the build side is a corpus-sized EXPLODED frame
    // with no shuffle beneath it — the static planner sizes it through the
    // Generate (an underestimate) and would happily broadcast it, the exact
    // driver-OOM hazard the round-7 ScaleProfile caught on x1 (the
    // documents/embeddings twin of this shape is impossible by lint;
    // lineitem is fact-table-sized, same discipline applies).
    binned.join(right.hint("SHUFFLE_HASH"),
        col("pk") === col("pk2") && col("bin") === col("bin2")
        && struct(col("ok"), col("ln")) < struct(col("ok2"), col("ln2")))
      .filter(col("st") <= col("en2") && col("st2") <= col("en")
        && col("sk") =!= col("sk2")
        && col("bin") === expr(s"greatest(st, st2) DIV $B"))
      .groupBy(col("pk"))
      .agg(count(lit(1)).as("overlap_pairs"))
      .orderBy("pk")
  }

  /** j16 — NEAREST as-of join (j9 covers backward-only; the nearest variant
    * is the other half of the as-of API surface): each purchase matched to
    * the same user's nearest click within ±1 hour; on an exact distance tie
    * the EARLIER click wins (D6). One tagged union + two frames of the same
    * user-keyed window (backward last / forward first, ignoreNulls) — the
    * sort-merge as-of shape, no range self-join. Clicks at the purchase's
    * own µs sort before it (kind 0 < 1) so they land in the backward frame;
    * all time math is exact integer µs (j9's µs protocol, D3).
    *
    * Scale: one shuffle on user_id serves both window frames; per-user
    * state is a sort, never a materialized pair set.
    */
  def j16(s: SparkSession, d: String): DataFrame = {
    val usPerHour = 3600L * 1000000L
    val e = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"),
        when(col("event_type") === "click", 0).otherwise(1).as("kind"))
      .withColumn("ck_id", when(col("kind") === 0, col("event_id")))
      .withColumn("ck_ts", when(col("kind") === 0, col("ts_us")))
    val ord = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("kind"), col("event_id"))
    val wBack = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    e.withColumn("b_id", last(col("ck_id"), ignoreNulls = true).over(wBack))
      .withColumn("b_ts", last(col("ck_ts"), ignoreNulls = true).over(wBack))
      .withColumn("f_id", first(col("ck_id"), ignoreNulls = true).over(wFwd))
      .withColumn("f_ts", first(col("ck_ts"), ignoreNulls = true).over(wFwd))
      .filter(col("kind") === 1)
      .withColumn("b_ok",
        col("b_ts").isNotNull && col("ts_us") - col("b_ts") <= usPerHour)
      .withColumn("f_ok",
        col("f_ts").isNotNull && col("f_ts") - col("ts_us") <= usPerHour)
      .withColumn("use_b", col("b_ok") &&
        (!col("f_ok") || col("ts_us") - col("b_ts") <= col("f_ts") - col("ts_us")))
      .filter(col("b_ok") || col("f_ok"))
      .select(col("event_id"), col("user_id"), col("ts_us").as("purchase_ts"),
        when(col("use_b"), col("b_id")).otherwise(col("f_id")).as("click_event_id"),
        (when(col("use_b"), col("b_ts")).otherwise(col("f_ts"))
          - col("ts_us")).as("delta_us"))
      .orderBy("event_id")
  }

  /** j17 — Bloom-prefiltered dimension join (j13's discipline on the OTHER
    * manual plan technique: like salting, the Bloom runtime filter is a PLAN
    * property — the exact join removes every false positive, so the result
    * is byte-identical to the plain join the oracle states, and a Bloom bug
    * (missed key ⇒ dropped rows) breaks the hash gate instead of hiding in
    * a capability test): revenue per supplier for one region's suppliers,
    * fact side pruned by `Sketches.bloomPreFilter` before the join.
    *
    * Scale: the Bloom is built over the REDUCED dim side (suppliers of 5
    * nations — dimension-sized, the same memory class as a broadcast-hash
    * build) and applied as a scan-adjacent filter, so non-matching fact rows
    * die before the shuffle — the manual form of Spark's
    * `runtime.bloomFilter` rewrite, pinned on rather than left to cost
    * estimation. The filter is sized from a dim-side count (expectedDim ≤ 0
    * → derive), so it cannot silently saturate at higher SFs the way a
    * hard-coded capacity would; the membership probe is Spark's native
    * `BloomFilterMightContain` codegen predicate (no Scala UDF on the hot
    * path — PlanLintSpec asserts it).
    */
  def j17(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.supplier(s, d)
      .join(Tables.nation(s, d),
        col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_nationkey") < 5)
      .select(col("s_suppkey"), col("s_name"))
    val fact = Tables.lineitem(s, d)
      .select(col("l_suppkey"), dec2(col("l_extendedprice")).as("price"))
    Sketches.bloomPreFilter(fact, dim, "l_suppkey", "s_suppkey",
        expectedDim = -1L, fpp = 0.01)
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n_items"), sum(col("price")).as("revenue"))
      .select(col("s_suppkey"), col("s_name"), col("n_items"),
        out2(col("revenue")).as("revenue"))
      .orderBy("s_suppkey")
  }

  /** j18 — correlated NOT EXISTS (the anti-join decorrelation path, closing
    * the subquery surface j11's scalars and j12's LATERAL opened): customers
    * with no open order. SQL-text-only form, j11's ephemeral-view
    * discipline; Catalyst rewrites to ONE left-anti hash join (`.explain`:
    * no per-row subquery execution) — the exact plan j6 writes by hand, so
    * the declarative form scales identically. Balances are value copies
    * (no arithmetic — exact parity, w7's rule).
    */
  def j18(s: SparkSession, d: String): DataFrame = {
    val vc = s"customer_j18_${Joins.viewSeq.incrementAndGet()}"
    val vo = s"orders_j18_${Joins.viewSeq.incrementAndGet()}"
    Tables.customer(s, d).createOrReplaceTempView(vc)
    Tables.orders(s, d).createOrReplaceTempView(vo)
    try s.sql(s"""SELECT c_custkey, c_name, c_acctbal FROM $vc c
             WHERE NOT EXISTS (SELECT 1 FROM $vo o
               WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
             ORDER BY c_custkey""")
    finally { s.catalog.dropTempView(vc); s.catalog.dropTempView(vo) }
  }

  /** j19 — BAND join (|s_acctbal − c_acctbal| ≤ 25) as a BUCKETED
    * equi-join: j8 declares the theta-join surface and Spark executes it
    * as a broadcast nested loop — correct, but O(n·m) predicate
    * evaluations and a broadcast that cannot hold a corpus-sized side.
    * This is the standard scale rewrite: quantize the band axis into
    * width-25 integer buckets, explode the PROBE side to its own bucket
    * ±1 (any in-band partner provably lands there), equi-join on the
    * bucket key, keep the residual band predicate. Each qualifying pair
    * matches EXACTLY once — the build row's bucket is a function of its
    * own value, so only one of the probe's three bucket rows can collide
    * with it (no post-join dedup). Cost: one keyed shuffle of 3n + m rows
    * on a dense integer key — broadcast-free, skew-safe, linear; the
    * pattern every interval/tolerance join (sensor alignment, price
    * matching, j15's interval overlap) reduces to at 100 TB.
    *
    * Bucketing is EXACT-INTEGER-CENTS (r9 verdict fix): bal ∕ 25 on raw
    * IEEE doubles can misbucket a pair whose |Δ| sits within one ulp of
    * exactly 25 (the quotients straddle two integer boundaries and the ±1
    * cover misses — [[graft.plans.BandJoinToBucket]]'s documented fp
    * hazard). Balances are 2-dp money, so round(bal·100) recovers the
    * exact integer cents, and floor(cents ∕ 2500) is exact: an
    * integer-valued double over 2500 is at least 1∕2500 from any
    * non-attained integer — far outside double rounding — so the floor
    * can never cross a boundary, and a residual-accepted pair has integer
    * cent distance ≤ 2500 ⇒ bucket distance ≤ 1: the ±1 cover is
    * provably complete.
    *
    * Determinism: the residual |Δ| ≤ 25 is a single IEEE op on
    * parquet-exact operands — identical on both engines; the oracle
    * states the PLAIN band predicate (the bucketing is a plan property,
    * invisible in the result); diff is one exact subtraction, 4-dp
    * rounded (D4).
    */
  def j19(s: SparkSession, d: String): DataFrame = {
    def centsBucket(c: Column): Column =
      floor(round(c * lit(100)) / lit(2500.0)).cast("long")
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_acctbal"),
        centsBucket(col("c_acctbal")).as("bucket"))
    val supp = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_acctbal"),
        explode(array(lit(-1L), lit(0L), lit(1L))).as("off"),
        centsBucket(col("s_acctbal")).as("sb"))
      .select(col("s_suppkey"), col("s_acctbal"),
        (col("sb") + col("off")).as("bucket"))
    supp.join(cust, Seq("bucket"))
      .filter(abs(col("s_acctbal") - col("c_acctbal")) <= lit(25.0))
      .select(col("s_suppkey"), col("c_custkey"),
        col("s_acctbal"), col("c_acctbal"),
        round4nz(abs(col("s_acctbal") - col("c_acctbal"))).as("bal_diff"))
      .orderBy("s_suppkey", "c_custkey")
  }

  /** j20 — DISJUNCTIVE join (same nation OR identical account balance),
    * stated as the plain OR predicate a user writes. Spark's planner
    * cannot extract a hash key from a top-level OR, so unaided this is a
    * broadcast nested loop — O(n·m) and a corpus can't broadcast. The
    * [[graft.plans.OrJoinToUnion]] optimizer rule (round 9's second
    * Catalyst piece, j19's sibling) rewrites it to UNION ALL of two hash
    * joins with the second branch guarded by NOT coalesce(e1, false) —
    * exact multiset, null-safe, each branch keyed. The declared output
    * aggregates the pair classes per supplier nation: total OR-matched
    * pairs, pairs from the nation key, pairs from the balance collision
    * (counted on the ORIGINAL predicates, so the result is
    * rewrite-invariant — the lint asserts the plan property).
    *
    * Determinism: balance equality on parquet-exact doubles is exact on
    * both engines; all outputs are integer counts (D2 trivially).
    */
  /** j21 — NULL-SAFE equi join (`<=>` / SQL `IS NOT DISTINCT FROM`): the
    * join-surface member j1–j20 left out. Nation 24 is nulled out on both
    * sides (`nullif`) so the fixture actually exercises the null-matches-
    * null semantics a plain `=` silently drops; Spark plans EqualNullSafe
    * as a HASH join key natively (the spec lints no nested loop), which
    * is the whole point of the operator — null-safe keys keep the keyed
    * shuffle at 100 TB. Declared output: pair counts per matched key
    * class (null class surfaced as −1), all integers (D2 trivially).
    */
  def j21(s: SparkSession, d: String): DataFrame = {
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey"), expr("nullif(s_nationkey, 24)").as("sk"))
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), expr("nullif(c_nationkey, 24)").as("ck"))
    sup.join(cust, col("sk") <=> col("ck"))
      .groupBy(coalesce(col("sk"), lit(-1L)).as("k"))
      .agg(count(lit(1)).as("n_pairs"),
        count(when(col("sk").isNull, 1)).as("n_null_pairs"))
      .orderBy("k")
  }

  def j20(s: SparkSession, d: String): DataFrame = {
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    sup.join(cust,
        col("s_nationkey") === col("c_nationkey") ||
          col("s_acctbal") === col("c_acctbal"))
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_pairs"),
        count(when(col("s_nationkey") === col("c_nationkey"), 1))
          .as("n_same_nation"),
        count(when(col("s_acctbal") === col("c_acctbal"), 1))
          .as("n_same_bal"))
      .orderBy("nationkey")
  }

  /** j22 — EXISTS-FLAG aggregation: the semi-join family (j5/j18) answers
    * "which orders match"; this answers "how MANY match, per segment,
    * across several EXISTS predicates at once" without running one
    * semi-join per predicate. The fact side is pre-aggregated to one
    * boolean flag row per order (`max(CASE)` ≡ EXISTS — the reduce-side
    * flag trick), then ONE left join carries both flags to orders and a
    * priority rollup counts them (left join keeps flag-less orders in
    * n_orders, coalesced to 0).
    *
    * Scale: the per-order flag agg is a map-side-combinable keyed count
    * (state = 2 ints per order), the join is the orders⨝lineitem equi
    * shape every TPC-H query pays, and the rollup axis is the 5-priority
    * domain — 2 keyed shuffles total however many EXISTS predicates ride
    * along (vs 1 shuffle PER predicate as stacked semi-joins).
    */
  def j22(s: SparkSession, d: String): DataFrame = {
    val flags = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_ret"),
        max(when(col("l_quantity") >= 45, 1).otherwise(0)).as("has_big"))
    Tables.orders(s, d)
      .join(flags, col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(coalesce(col("has_ret"), lit(0))).as("n_with_return"),
        sum(coalesce(col("has_big"), lit(0))).as("n_with_big"),
        sum(when(col("has_ret") === 1 && col("has_big") === 1, 1)
          .otherwise(0)).as("n_with_both"))
      .orderBy("o_orderpriority")
  }
}
