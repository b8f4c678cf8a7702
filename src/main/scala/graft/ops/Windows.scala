package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Det._

/** Window-function queries (SURVEY.md §2.4). The reference has no window
  * surface [RECON]; these are north-star analytics. Scale note: every window
  * below is partitioned by a real key except w5, whose input is one row per
  * calendar day (bounded) — a global window over a bounded set is safe.
  */
object Windows {

  /** w1 — row_number / rank / dense_rank within brand. row_number's window
    * carries a unique tie-break; rank/dense_rank intentionally order by the
    * value alone (ties collapse identically in both engines).
    */
  def w1(s: SparkSession, d: String): DataFrame = {
    val wRn = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    val wRk = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc)
    Tables.part(s, d)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        row_number().over(wRn).as("rn"),
        rank().over(wRk).as("rk"),
        dense_rank().over(wRk).as("drk"))
      .orderBy("p_brand", "p_partkey")
  }

  /** w2 — distributed top-k per group via the custom TopKPerGroup operator
    * (graft.plans): per-partition bounded heaps, shuffle carries at most
    * k·groups·partitions rows, no group ever fully sorted. The rank column
    * is re-derived by a window over the ALREADY-REDUCED ≤k-rows-per-group
    * result (trivial), keeping the output identical to the plain
    * window+filter formulation the oracle mirrors.
    */
  def w2(s: SparkSession, d: String): DataFrame = {
    val topk = graft.plans.TopKPerGroup(Tables.part(s, d), Seq("p_brand"),
      Seq(("p_retailprice", true), ("p_partkey", false)), 3)
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    topk
      .withColumn("rn", row_number().over(w))
      .select(col("p_brand"), col("rn"), col("p_partkey"), col("p_retailprice"))
      .orderBy("p_brand", "rn")
  }

  /** w11 — top-2 orders per customer stated as the PLAIN window idiom
    * (`row_number() OVER (…) <= 2`, rank column dropped) — w2's semantics
    * written the way every SQL user writes them. Under the installed
    * [[graft.plans.RowNumberTopK]] rule (round 10's Catalyst piece) the
    * whole Filter+Window assembly collapses to the bounded-heap
    * TopKPerGroup operator — no partition ever fully sorted, one exchange
    * of ≤ k·groups·partitions rows (measured 2.4× over the native
    * WindowGroupLimit plan, ProbeTopK); on a vanilla session Spark's own
    * group-limit pruning plans it — SAME answer either way (the
    * install-independence contract test), which is the point: the rule is
    * a plan property, invisible in the result. Total order
    * (totalprice desc, orderkey) per D6; output is value copies only.
    */
  def w11(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** w12 — tie-KEEPING top-2 lineitems per supplier by quantity, stated as
    * the plain `rank() OVER (…) <= 2` idiom with the rank column dropped —
    * w11's rank()-form sibling, and the declared face of round 11's
    * tie-preserving TopKPerGroup modes. The order is deliberately NOT
    * total (quantity only): integer quantities tie densely, so every
    * boundary tie is kept and groups emit more than k rows — exactly the
    * rank() contract a row_number heap cannot express. Under the installed
    * [[graft.plans.RowNumberTopK]] rule the Filter+Window assembly
    * collapses to TopKPerGroupExec's Rank ties mode (bounded order-value
    * classes, no partition fully sorted — measured 2.2× over the native
    * WindowGroupLimit plan, ProbeTopK); on a vanilla session Spark's
    * group-limit pruning plans it — same answer either way (the
    * install-independence contract). The output SET is deterministic under
    * the partial order (ties are kept, not sampled), so the hash gate
    * holds without a tiebreak column.
    */
  def w12(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey").orderBy(col("l_quantity").desc)
    Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), rank().over(w).as("rn"))
      .filter(col("rn") <= 2)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  /** w13 — top-2 DISTINCT quantity tiers per supplier: the plain
    * `dense_rank() <= 2` drop-rank idiom, completing the declared trio
    * (w11 row_number / w12 rank / w13 dense_rank — one query per
    * [[graft.plans.TopKTies]] mode, all through the standard SQL form).
    * dense_rank keeps every row of the k best VALUES — per-value
    * multiplicity unbounded, the "give me all rows at the top two price
    * tiers" contract. Under the installed rule the assembly collapses to
    * TopKPerGroupExec's Dense ties mode (≤ k order-value classes per
    * group); vanilla session = Spark's native group-limit — same answer
    * (install-independence). Output SET deterministic under the partial
    * order.
    */
  def w13(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey").orderBy(col("l_quantity").desc)
    Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), dense_rank().over(w).as("rn"))
      .filter(col("rn") <= 2)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  /** w3 — running count + running decimal total per customer (rows frame). */
  def w3(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        asDate(col("o_orderdate")).as("order_date"),
        count(lit(1)).over(w).as("running_cnt"),
        out2(sum(dec2(col("o_totalprice"))).over(w)).as("running_total"))
      .orderBy("o_custkey", "order_date", "o_orderkey")
  }

  /** w4 — lag/lead + event-time gap in whole seconds (integer ns math, D3). */
  def w4(s: SparkSession, d: String): DataFrame = {
    // µs protocol (DuckDB ≤1.0 truncates ns-parquet to µs on read).
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("ts", expr("ts div 1000"))
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        lag("event_type", 1).over(w).as("prev_type"),
        lead("event_type", 1).over(w).as("next_type"),
        lag("ts", 1).over(w).as("prev_ts"))
      .withColumn("gap_sec", expr("(ts - prev_ts) div 1000000"))
      .drop("prev_ts")
      .orderBy("user_id", "ts", "event_id")
  }

  /** w6 — distribution-rank functions: ntile quartiles, percent_rank,
    * cume_dist over a total order (custkey tie-break makes ntile
    * deterministic; the rank ratios are exact small rationals, rounded 4 dp
    * on both engines per D4).
    */
  def w6(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        graft.Det.round4fast(percent_rank().over(w)).as("pct_rank"),
        graft.Det.round4fast(cume_dist().over(w)).as("cdist"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** w7 — value-picking window functions over the full-partition frame:
    * each order row sees its customer's first / last / 2nd order price
    * (ordered by date, key). first/last/nth copy INPUT values — no
    * arithmetic — so parity needs only the explicit
    * `ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING` frame on
    * both engines (the default frame would make last/nth depend on the
    * current row).
    */
  def w7(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        asDate(col("o_orderdate")).as("order_date"), col("o_totalprice"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      .orderBy("o_custkey", "order_date", "o_orderkey")
  }

  /** w5 — 7-row moving total over daily order revenue (ROWS frame) plus the
    * RANGE-frame variant over a day index (covers calendar gaps differently).
    *
    * The unpartitioned window (Spark WARNs: all rows to one partition) is
    * deliberate and scale-safe: its input is already aggregated to calendar
    * DAYS, so the windowed row count is bounded by the date span (~2.4k
    * rows for 7 years) no matter the corpus size — the corpus-sized work is
    * the day groupBy above it, which shuffles normally. A global moving
    * average over a time series has exactly this shape at any scale.
    */
  def w5(s: SparkSession, d: String): DataFrame = {
    // day_total_dec stays DECIMAL through the window sums (exact under any
    // evaluation order); only the three emitted columns out-cast to double.
    val daily = Tables.orders(s, d)
      .groupBy(asDate(col("o_orderdate")).as("day"))
      .agg(sum(dec2(col("o_totalprice"))).as("day_total_dec"))
      .withColumn("day_idx", datediff(col("day"), lit("1995-01-01").cast("date")))
    val wRows = Window.orderBy("day_idx").rowsBetween(-6, 0)
    val wRange = Window.orderBy("day_idx").rangeBetween(-6, 0)
    daily
      .select(col("day"), out2(col("day_total_dec")).as("day_total"),
        out2(sum(col("day_total_dec")).over(wRows)).as("mov7_rows"),
        out2(sum(col("day_total_dec")).over(wRange)).as("mov7_range"))
      .orderBy("day")
  }

  /** w8 — GLOBAL spend deciles: every customer ranked by lifetime spend over
    * the whole corpus, ntile(10)-bucketed, then per-decile count / total /
    * min / max. The semantics are one `ntile(10) OVER (ORDER BY spend DESC,
    * custkey)` — but a partition-less window serializes the corpus through
    * ONE task (the textbook global-window anti-pattern w5's note warns
    * about), so the decile is computed with x27's range-partitioned
    * prefix-sum idiom instead: `repartitionByRange(spend DESC, custkey)`
    * lays the rows out globally sorted across cells, the global position is
    * (within-cell row_number) + (P-row cell-offset window — bounded by the
    * partition count, never the corpus), and the standard-SQL ntile bucket
    * arithmetic (first n MOD 10 buckets hold one extra row) is applied to
    * the position. The cell assignment comes from a SAMPLED range
    * partitioner read by two consumers (the window and the offsets
    * subtree), so it is materialized ONCE ([[graft.Ckpt]], x27's
    * discipline). Oracle states the plain ntile(10) window; OperatorSpec
    * additionally asserts the distributed arithmetic equals Spark's own
    * `ntile` on the same input.
    */
  def w8(s: SparkSession, d: String): DataFrame = {
    val cells = graft.Ckpt(w8Cells(s, d))
    val wIn = Window.partitionBy("cell")
      .orderBy(col("spend").desc, col("o_custkey"))
    val wOff = Window.orderBy(col("cell"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = cells.groupBy("cell").agg(count(lit(1)).as("btot"))
      .withColumn("off", sum(col("btot")).over(wOff) - col("btot"))
      .withColumn("n_total", sum(col("btot")).over(
        Window.orderBy(col("cell")).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("cell"), col("off"), col("n_total"))
    cells.withColumn("rn_in", row_number().over(wIn))
      .join(offsets, Seq("cell"))
      .withColumn("pos", col("off") + col("rn_in"))
      .withColumn("decile", ntileBucket("pos", "n_total", 10))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_cust"),
        out2(sum(col("spend"))).as("tot_spend"),
        out2(min(col("spend"))).as("min_spend"),
        out2(max(col("spend"))).as("max_spend"))
      .orderBy("decile")
  }

  /** Standard-SQL `ntile(k)` bucket from a 1-based global position and the
    * total row count — the arithmetic that lets a distributed rank (the
    * x27/w8 range-partitioned prefix sum) replace the single-partition
    * global ntile window: q = n DIV k, r = n MOD k; the first r buckets
    * hold q+1 rows. The CASE keeps the q=0 division unreachable when
    * n < k (every pos then lands in the first branch).
    * PropertySpec asserts equality with Spark's own `ntile` across
    * adversarial (n, k) shapes.
    */
  private[graft] def ntileBucket(posCol: String, nCol: String, k: Int): Column =
    expr(
      s"""CASE WHEN $posCol <= ($nCol % $k) * ($nCol DIV $k + 1)
         | THEN ($posCol - 1) DIV ($nCol DIV $k + 1) + 1
         | ELSE ($nCol % $k) +
         |  ($posCol - 1 - ($nCol % $k) * ($nCol DIV $k + 1))
         |   DIV ($nCol DIV $k) + 1 END""".stripMargin).cast("int")

  /** Monotone suffix for per-call temp-view names (w9) — Joins.viewSeq's
    * discipline. */
  private val viewSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** w9 — CALENDAR-INTERVAL range frame (`RANGE BETWEEN INTERVAL 7 DAY
    * PRECEDING`): per supplier-day, shipments and decimal revenue over the
    * trailing 7 CALENDAR days — the time-aware frame w5's row frame and
    * s9's numeric-µs range approximate but don't state (calendar interval
    * bounds only exist in SQL text; the DataFrame `rangeBetween` API takes
    * longs, so the query is SQL-authored like a18/u5). Pre-aggregating to
    * one row per (supplier, day) keeps the output key unique (the
    * lineitem-grain fixture key (orderkey, linenumber) is NOT unique —
    * FIXTURES gotcha) and bounds the frame's row count by the 7-day
    * calendar, not shipment density. Decimal sums stay exact through the
    * frame (D2); one keyed shuffle + one keyed window.
    */
  def w9(s: SparkSession, d: String): DataFrame = {
    val lv = s"lineitem_w9_${viewSeq.incrementAndGet()}"
    Tables.lineitem(s, d).createOrReplaceTempView(lv)
    try s.sql(
      s"""WITH daily AS (SELECT l_suppkey,
         |   CAST(l_shipdate AS DATE) AS d,
         |   COUNT(*) AS n,
         |   SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
         |  FROM $lv GROUP BY 1, 2)
         |SELECT l_suppkey, d, n,
         | SUM(n) OVER w AS n7,
         | CAST(CAST(SUM(rev) OVER w AS DECIMAL(18,2)) AS DOUBLE) AS rev7
         |FROM daily
         |WINDOW w AS (PARTITION BY l_suppkey ORDER BY d
         | RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
         |ORDER BY l_suppkey, d""".stripMargin)
    finally s.catalog.dropTempView(lv)
  }

  /** w8's range-partitioned, cell-tagged spend frame — UN-checkpointed so
    * PlanLintSpec can lint the plan the checkpoint hides. */
  private[graft] def w8Cells(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).groupBy(col("o_custkey"))
      .agg(sum(dec2(col("o_totalprice"))).as("spend"))
      .repartitionByRange(col("spend").desc, col("o_custkey"))
      .withColumn("cell", spark_partition_id())

  /** w10 — Pareto concentration: the top-20 customers by order revenue and
    * the cumulative share of TOTAL revenue each rank accounts for (the
    * "top k% drive X%" curve every revenue review opens with).
    *
    * Scale: the unbounded-axis global window hazard (w5's note) is avoided
    * by construction — revenue is a keyed agg, the top-20 cut plans as
    * TakeOrderedAndProject (no global sort), and the rank/cumsum window
    * then runs over exactly 20 ROWS; the corpus-wide total joins as ONE
    * broadcast scalar row. Money stays decimal until the single share
    * division (D2/D4 — decimal→double casts are exact at these magnitudes).
    */
  def w10(s: SparkSession, d: String): DataFrame = {
    // the per-customer revenue frame feeds BOTH the total and the top-20
    // cut — Ckpt it so the orders scan + customer-keyed shuffle run once
    // (l7/l9's shared-frame discipline), not once per consumer
    val rev = graft.Ckpt(Tables.orders(s, d).groupBy(col("o_custkey"))
      .agg(sum(dec2(col("o_totalprice"))).as("rev")))
    val tot = rev.agg(sum(col("rev")).as("tot"))
    val top = rev.orderBy(col("rev").desc, col("o_custkey")).limit(20)
    val w = Window.orderBy(col("rev").desc, col("o_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top
      .withColumn("rnk", row_number().over(w))
      .withColumn("cum_rev", sum(col("rev")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("rnk"), col("o_custkey"), out2(col("rev")).as("revenue"),
        graft.Det.round4fast(col("cum_rev").cast("double")
          / col("tot").cast("double")).as("cum_share"))
      .orderBy("rnk")
  }
}
