package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Det._

/** Aggregation queries (SURVEY.md §2.3). Reference analog [RECON]: combiner
  * (partial aggregation) + reducer-side counting; Spark's HashAggregateExec
  * partial→final is the automatic twin. Rollup/cube/grouping-sets/percentiles
  * exceed the reference surface (north-star extension).
  */
object Aggs {

  /** a1 — TPC-H-Q1-style pricing summary. All money math in fixed-scale
    * decimals (D2); scale is never reduced on output casts.
    */
  def a1(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        out2(sum(dec2(col("l_quantity")))).as("sum_qty"),
        out2(sum(dec2(col("l_extendedprice")))).as("sum_base_price"),
        out4(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** a2 — COUNT(DISTINCT) per order year (Expand + two-phase agg). */
  def a2(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(countDistinct(col("l_suppkey")).as("supp_cnt"),
        count(lit(1)).as("line_cnt"))
      .orderBy("order_year")

  /** a3 — ROLLUP with grouping_id (oracle gid = grouping(a)*2+grouping(b),
    * verified SURVEY §2.0); D5 nulls-first on the nullable dims.
    */
  def a3(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(out2(sum(dec2(col("o_totalprice")))).as("revenue"),
        count(lit(1)).as("order_cnt"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("n_name").asc_nulls_first, col("c_mktsegment").asc_nulls_first,
        col("gid"))

  /** a4 — CUBE over two low-cardinality order dimensions. */
  def a4(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("order_cnt"),
        out2(sum(dec2(col("o_totalprice")))).as("revenue"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first, col("gid"))

  /** a5 — explicit GROUPING SETS via the native Dataset.groupingSets API
    * (Spark 4) — no SQL text, no temp view, no shared-catalog side effect.
    */
  def a5(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupingSets(
        Seq(Seq(col("lang"), col("source")), Seq(col("lang")), Seq.empty),
        col("lang"), col("source"))
      .agg(count(lit(1)).as("doc_cnt"), sum(col("n_chars")).as("sum_chars"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first,
        col("gid"))

  /** a11 — conditional (pivot-style) aggregation: per-nation order counts by
    * status and high-value revenue share, via sum(CASE WHEN) so empty cells
    * are exact zeros in both engines (Spark's pivot emits NULL there).
    */
  def a11(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("cnt_f"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("cnt_o"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("cnt_p"),
        out2(sum(when(col("o_totalprice") > 200000.0, dec2(col("o_totalprice")))
          .otherwise(dec2(lit(0.0))))).as("hi_value_revenue"))
      .orderBy("n_name")

  /** a12 — statistical moments done scale-safe: Pearson correlation, sample
    * covariance and sample stddevs of (l_quantity, l_extendedprice) per
    * return flag. Spark's native `corr`/`stddev` aggregate DOUBLES, whose
    * sum order differs between partitions and engines — so the moments
    * (n, Σx, Σy, Σx², Σy², Σxy) are aggregated as fixed-scale DECIMALS
    * (exact, order-independent, one keyed shuffle with partial aggregation)
    * and the closed-form statistics are computed from the six exact moments
    * in one fixed double-expression order mirrored by the oracle.
    */
  def a12(s: SparkSession, d: String): DataFrame = {
    val x = col("l_quantity"); val y = col("l_extendedprice")
    val g = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(x)).as("sx"), sum(dec2(y)).as("sy"),
        sum(dec4(x * x)).as("sxx"), sum(dec4(y * y)).as("syy"),
        sum(dec4(x * y)).as("sxy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double"); val syy = col("syy").cast("double")
    val sxy = col("sxy").cast("double")
    g.select(col("l_returnflag"), col("n"),
        round4nz((n * sxy - sx * sy)
          / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))).as("corr_qty_price"),
        round4nz((sxy - sx * sy / n) / (n - lit(1.0))).as("covar_samp"),
        round4nz(sqrt((n * sxx - sx * sx) / (n * (n - lit(1.0))))).as("stddev_qty"),
        round4nz(sqrt((n * syy - sy * sy) / (n * (n - lit(1.0))))).as("stddev_price"))
      .orderBy("l_returnflag")
  }

  /** a13 — UNPIVOT (wide→long melt): per-priority order counts by status,
    * melted with `Dataset.unpivot` so each (priority, status) is one row.
    * The wide frame renames the measures to the wanted variable values
    * ('F','O','P') because unpivot emits source column NAMES as the
    * variable column; the oracle mirrors with a UNION ALL melt.
    */
  def a13(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("F"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("O"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("P"))
      .unpivot(Array(col("o_orderpriority")), Array(col("F"), col("O"), col("P")),
        "status", "cnt")
      .orderBy("o_orderpriority", "status")

  /** a10 — exact continuous percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`, same linear interpolation — verified SURVEY §2.0).
    */
  def a10(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(round(percentile(col("n_chars"), lit(0.5)), 2).as("p50"),
        round(percentile(col("n_chars"), lit(0.9)), 2).as("p90"),
        count(lit(1)).as("doc_cnt"))
      .orderBy("lang")

  /** a14 — PIVOT (long→wide, the inverse of a13's unpivot): per-returnflag
    * row with one (qty, cnt) column pair per linestatus. The pivot values
    * are pinned to the fixture domain {F,O} so the output schema is static
    * (an unpinned pivot needs a distinct-values job first — never do that in
    * a declared query); Catalyst rewrites the pivot into one conditional
    * aggregation pass, which is exactly the oracle's CASE formulation.
    * Money math stays decimal until the final out-cast (D2).
    */
  def a14(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(out2(sum(dec2(col("l_quantity")))).as("qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")

  /** a15 — fixed-width histogram (the binning every profiling pass needs):
    * orders bucketed by total price into 50k-wide bins, top bin open-ended.
    * Bucket index is exact integer math on both engines (identical IEEE
    * divide + floor), so bin membership can't flake; per-bin money stats are
    * decimal until the final cast (D2). One keyed aggregation — narrow,
    * nothing to tune at 100 TB.
    */
  def a15(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("bucket", least(floor(col("o_totalprice") / 50000).cast("long"), lit(9L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("order_cnt"),
        out2(sum(dec2(col("o_totalprice")))).as("revenue"),
        out2(min(dec2(col("o_totalprice")))).as("min_price"),
        out2(max(dec2(col("o_totalprice")))).as("max_price"))
      .orderBy("bucket")

  /** a16 — ordered string aggregation (LISTAGG / GROUP_CONCAT; the
    * reducer-side value-concatenation idiom [RECON analog: a reducer
    * emitting one delimited list per join key]): per region, the sorted CSV
    * of its nation names. `collect_list` assembles elements in partition
    * order — nondeterministic — so the list is `array_sort`ed BEFORE
    * joining; the oracle's `string_agg` carries an explicit ORDER BY for
    * the same reason. The grouped lists are dimension-bounded (≤ 25 nations
    * per region): an unbounded listagg concentrates a whole group on one
    * row and has no place in a declared query at scale.
    */
  def a16(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"),
        array_join(array_sort(collect_list(col("n_name"))), ",").as("nations_csv"))
      .orderBy("r_name")

  /** a17 — per-segment least-squares regression of order price against
    * order date (the `regr_slope`/`regr_intercept`/`r²` surface), done
    * scale-safe exactly like a12: the native regr_* functions aggregate
    * raw doubles (order-dependent between partitions/engines), so the
    * moments aggregate exactly — x (days since 1995-01-01) as integer
    * longs, money in fixed-scale decimals — and the closed forms evaluate
    * in one fixed double-expression order mirrored textually by the
    * oracle (the intercept repeats the slope subexpression verbatim on
    * both engines rather than referencing a rounded value). One keyed
    * shuffle with partial aggregation; five rows out.
    */
  def a17(s: SparkSession, d: String): DataFrame = {
    val g = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("long").as("x"),
        col("o_totalprice").as("y"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(dec2(col("y"))).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(dec4(col("y") * col("y"))).as("syy"),
        sum(dec4(col("x") * col("y"))).as("sxy"))
    val nd = col("n").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double"); val syy = col("syy").cast("double")
    val sxy = col("sxy").cast("double")
    val slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    g.select(col("c_mktsegment"), col("n"),
        round4nz(slope).as("slope"),
        round4nz((sy - slope * sx) / nd).as("intercept"),
        round4nz(((nd * sxy - sx * sy) * (nd * sxy - sx * sy))
          / ((nd * sxx - sx * sx) * (nd * syy - sy * sy))).as("r2"))
      .orderBy("c_mktsegment")
  }

  /** Monotone suffix for per-call temp-view names (a18). */
  private val viewSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** a18 — RECURSIVE-CTE calendar gap fill (Spark 4 `WITH RECURSIVE`,
    * executed as a distributed union loop): generate every day of 1995-Q1
    * by recursion, left-join daily order counts, flag the gap days — the
    * canonical dense-time-axis repair every reporting stack needs before
    * a window over days is trustworthy (w5's moving averages note exactly
    * this calendar-gap caveat). Recursion depth 90 sits far under Spark's
    * recursion level limit; each step is one narrow row, the join is one
    * keyed left join against the day-aggregated orders — the recursion
    * NEVER touches corpus-sized data.
    */
  def a18(s: SparkSession, d: String): DataFrame = {
    val ov = s"orders_a18_${viewSeq.incrementAndGet()}"
    Tables.orders(s, d).createOrReplaceTempView(ov)
    try s.sql(
      s"""WITH RECURSIVE days(day) AS (
         |  SELECT DATE '1995-01-01'
         |  UNION ALL SELECT date_add(day, 1) FROM days
         |  WHERE day < DATE '1995-03-31'),
         | daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
         |    COUNT(*) AS n_orders
         |   FROM $ov
         |   WHERE CAST(o_orderdate AS DATE)
         |     BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
         |   GROUP BY 1)
         |SELECT days.day, COALESCE(daily.n_orders, 0) AS n_orders,
         | CAST(daily.day IS NULL AS INT) AS is_gap
         |FROM days LEFT JOIN daily ON days.day = daily.day
         |ORDER BY days.day""".stripMargin)
    finally s.catalog.dropTempView(ov)
  }

  /** a19 — gap-fill with LINEAR INTERPOLATION (a18 fills gaps with zeros;
    * this is the time-series variant a metrics/feature pipeline actually
    * wants): the Q1-1995 daily revenue series on a dense calendar grid, gap
    * days filled by linearly interpolating between the nearest observed
    * neighbors (leading/trailing gaps carry the nearest single neighbor).
    * The prev/next carries are `last(…, ignoreNulls) OVER rows-preceding` /
    * `first(…, ignoreNulls) OVER rows-following` — the j9 as-of idiom run in
    * both directions, no self-join.
    *
    * Determinism (D2/D4): daily totals aggregate as DECIMAL(18,2) (exact),
    * convert to double once, and the interpolation is ONE fixed-shape IEEE
    * expression — `pv + (nv - pv) * (i - pi) / (ni - pi)` with identical
    * association in the oracle text — rounded 4-dp with -0 normalized.
    * Scale: the corpus-sized work is the day groupBy; the windows run over
    * the bounded calendar grid (w5's note — 90 rows here, ~2.5k for 7
    * years), so the partition-less frames are safe at any corpus size. A
    * per-key variant adds the key to `partitionBy` and stays unbounded.
    */
  def a19(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .filter(col("o_orderdate").cast("date")
        .between(lit("1995-01-01").cast("date"), lit("1995-03-31").cast("date")))
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(dec2(col("o_totalprice"))).as("v"))
    val grid = s.range(1).select(explode(expr(
      "sequence(DATE'1995-01-01', DATE'1995-03-31')")).as("day"))
    val wPrev = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val vd = col("v").cast("double")
    val e = grid.join(daily, Seq("day"), "left_outer")
      .withColumn("i", datediff(col("day"), lit("1995-01-01").cast("date"))
        .cast("double"))
      .withColumn("pv", last(when(col("v").isNotNull, vd), ignoreNulls = true)
        .over(wPrev))
      .withColumn("pi", last(when(col("v").isNotNull, col("i")),
        ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(when(col("v").isNotNull, vd), ignoreNulls = true)
        .over(wNext))
      .withColumn("ni", first(when(col("v").isNotNull, col("i")),
        ignoreNulls = true).over(wNext))
    e.select(col("day"),
      when(col("v").isNotNull, 1).otherwise(0).cast("int").as("obs"),
      round4nz(
        when(col("v").isNotNull, vd)
          .when(col("pv").isNotNull && col("nv").isNotNull,
            col("pv") + (col("nv") - col("pv")) * (col("i") - col("pi"))
              / (col("ni") - col("pi")))
          .when(col("pv").isNotNull, col("pv"))
          .when(col("nv").isNotNull, col("nv"))
          .otherwise(lit(0.0))).as("filled"))
      .orderBy("day")
  }

  /** a20 — WEIGHTED MEDIAN (quantity-weighted median line price per return
    * flag): the smallest price whose cumulative quantity reaches half the
    * group's total — the robust-statistics aggregate no SQL engine ships
    * natively, expressed as the running-sum crossing. Exact end-to-end:
    * weights collapse per (flag, price) level first (one keyed agg — the
    * window then runs over price LEVELS, bounded by price cardinality,
    * not line items), cumulative/total quantity are integer window sums,
    * the crossing test `2·cum ≥ tot` is pure integer compare, and the
    * crossing row is picked by `min_by` over the UNIQUE price ordering key
    * (deterministic, D6; DuckDB `arg_min` is the same contract). Only the
    * emitted share divides — one correctly-rounded double op (D4).
    */
  def a20(s: SparkSession, d: String): DataFrame = {
    // Round-15 (r14-verdict item 4): the crossing is SIZE-GATED — the
    // level frame is materialized (Ckpt) so its exact level count is one
    // cheap job, and past [[medianDistributedMinLevels]] the crossing
    // runs the range-partitioned two-phase form instead of the
    // flag-partitioned window (whose per-flag sort is ONE task however
    // wide the cluster — the 100 TB scale-killer class). At every fixture
    // SF the count is far below the measured crossover, so the declared
    // plan stays the window form.
    val perPrice = graft.Ckpt(Tables.lineitem(s, d)
      .select(col("l_returnflag"), dec2(col("l_extendedprice")).as("price"),
        col("l_quantity").cast("bigint").as("w"))
      .groupBy(col("l_returnflag"), col("price"))
      .agg(sum(col("w")).as("w")))
    cumLevelsGated(perPrice, "price", perPrice.count(), s)
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(col("l_returnflag"))
      .agg(out2(min(col("price"))).as("wmedian"),
        expr("min_by(cum, price)").as("cum_at"),
        max(col("tot")).as("tot_w"))
      .withColumn("cum_share", graft.Det.round4fast(
        col("cum_at").cast("double") / col("tot_w").cast("double")))
      .select(col("l_returnflag"), col("wmedian"), col("tot_w"),
        col("cum_share"))
      .orderBy("l_returnflag")
  }

  /** a21 — per-group MODE with a stated tie-break: each user's most frequent
    * event_type (highest count; ties go to the lexicographically smallest
    * type — stated because MODE is non-deterministic on ties in both engines'
    * built-ins, so neither `mode()` is usable under the hash gate). Share is
    * one correctly-rounded double division of two exact longs (D4).
    *
    * Scale: two keyed aggs (user×type counts, then per-user totals via a
    * window over ≤5 rows/user) + a row_number pick — everything keyed by
    * user_id, no global ordering until the final output sort. The per-user
    * window partitions are bounded by the TYPE cardinality, not the event
    * count, so no partition outgrows memory at any corpus size.
    */
  def a21(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val wPick = Window.partitionBy("user_id")
      .orderBy(col("cnt").desc, col("event_type"))
    val wTot = Window.partitionBy("user_id")
    counts
      .withColumn("rn", row_number().over(wPick))
      .withColumn("n_events", sum(col("cnt")).over(wTot))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("mode_type"),
        col("cnt").as("mode_cnt"), col("n_events"),
        graft.Det.round4fast(col("cnt").cast("double")
          / col("n_events").cast("double")).as("mode_share"))
      .orderBy("user_id")
  }

  /** a22 — MEDIAN ABSOLUTE DEVIATION per flag (the robust dispersion
    * statistic that pairs with a20's weighted median; no engine ships it
    * natively): med = lower median of price, mad = lower median of
    * |price − med|. BOTH medians run a20's running-sum crossing over
    * collapsed price LEVELS — `2·cum ≥ tot` integer test, `min` price at
    * the crossing (D6) — so the whole statistic is decimal/integer exact,
    * no percentile interpolation to disagree on.
    *
    * Scale: two level-collapsing keyed aggs + two level-bounded windows
    * (bounded by PRICE cardinality, not row count — a20's argument) + two
    * joins of the flag-cardinality median frame. The LEVEL frame feeds
    * three consumers (median chain, deviation re-agg, and the median's
    * second use), so it is materialized ONCE through Ckpt — without it
    * each consumer re-scans lineitem and re-runs the level agg; the frame
    * is price-DOMAIN-bounded, so the materialization is fixed-size at any
    * corpus. Measured floor ~4.9 s at sf0.1, FLAT 1.0× at 8× data (the
    * price domain, and with it the level count and window length, does
    * not grow with the corpus — the crossing cost is a constant, not a
    * scaling term; see BASELINE's scale row). The median frame carries
    * NO broadcast hint: it sits above materialized shuffle stages, so AQE
    * broadcasts it from its REAL runtime size (the corpus-broadcast-hint
    * lint's documented discipline for aggregate-topped build sides).
    */
  /** The group-windowed cumulative-sum frame of a level frame
    * ((l_returnflag, value, w) → + cum, tot): the LOCAL-scale form of the
    * a20/a22 crossing — per-flag parallelism is the flag count, so one
    * task sorts a whole flag's levels. */
  private[graft] def cumLevelsWindow(levels: DataFrame,
      value: String): DataFrame = {
    val wCum = Window.partitionBy("l_returnflag").orderBy(value)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("l_returnflag")
    levels
      .withColumn("cum", sum(col("w")).over(wCum))
      .withColumn("tot", sum(col("w")).over(wTot))
  }

  /** Conf knob for the crossing gate: the level count at or above which
    * the range-partitioned two-phase form replaces the group window.
    * Local default = the measured tie point (ProbeMedianGate, synthetic
    * 3-flag level frames, this box/local[32]: window wins at 1M/2M/8M
    * levels — 0.78 vs 1.73 s, 1.63 vs 3.65 s, 3.24 vs 4.10 s — the two tie
    * at 20M — 9.71 vs 9.81 s — and distributed wins at 40M — 40.5 vs
    * 38.5 s). Switching at the tie costs nothing below it and caps the
    * window form's per-flag single-task sort beyond it; a cluster tunes
    * the knob per hardware (the window form's parallelism is the FLAG
    * count, so wider clusters cross over earlier). */
  private[graft] val DistributedMinLevelsKey =
    "spark.graft.median.distributedMinLevels"
  private[graft] def medianDistributedMinLevels(s: SparkSession): Long =
    s.conf.getOption(DistributedMinLevelsKey).map(_.toLong)
      .getOrElse(20000000L)

  /** SIZE-GATED cumulative-sum frame (r14-verdict item 4): pick the
    * window or the range-partitioned distributed form from the MEASURED
    * level count instead of hard-coding the local winner. The two forms
    * are byte-identical (prefix sums are partition-boundary-invariant —
    * CapabilitySpec proves the equality), so the gate is pure plan
    * strategy; callers pass the count read off their already-materialized
    * level frame (one cheap job — kCore's loop-probe discipline). */
  private[graft] def cumLevelsGated(levels: DataFrame, value: String,
      nLevels: Long, s: SparkSession): DataFrame =
    if (nLevels >= medianDistributedMinLevels(s))
      cumLevelsDistributed(levels, value)
    else cumLevelsWindow(levels, value)

  def a22(s: SparkSession, d: String): DataFrame = {
    val lv = graft.Ckpt(Tables.lineitem(s, d)
      .select(col("l_returnflag"), dec2(col("l_extendedprice")).as("p"))
      .groupBy(col("l_returnflag"), col("p"))
      .agg(count(lit(1)).as("w")))
    // One count over the Ckpt'd (already materialized) level frame feeds
    // the size gate for BOTH crossings; the deviation frame's level count
    // is ≤ lv's per flag (|p − med| collapses levels), so one gate decides
    // both. At every fixture SF this picks the window form — the declared
    // local plan is unchanged; past the measured crossover the crossing
    // switches to the x27-style distributed prefix sum instead of one
    // task sorting a whole flag's levels.
    val nLevels = lv.count()
    def lowerMedian(levels: DataFrame, value: String, out: String): DataFrame =
      cumLevelsGated(levels, value, nLevels, s)
        .filter(col("cum") * 2 >= col("tot"))
        .groupBy(col("l_returnflag"))
        .agg(min(col(value)).as(out), max(col("tot")).as(out + "_n"))
    val med = lowerMedian(lv, "p", "med")
    val dev = lv.join(med, Seq("l_returnflag"))
      .select(col("l_returnflag"), abs(col("p") - col("med")).as("dv"), col("w"))
      .groupBy(col("l_returnflag"), col("dv"))
      .agg(sum(col("w")).as("w"))
    lowerMedian(dev, "dv", "mad")
      .join(med, Seq("l_returnflag"))
      .select(col("l_returnflag"), out2(col("med")).as("median_price"),
        out2(col("mad")).as("mad"), col("med_n").as("n_items"))
      .orderBy("l_returnflag")
  }

  /** Capability (non-declared): the RANGE-PARTITIONED two-phase form of
    * a20/a22's running-sum crossing — x27's canonical distributed prefix
    * sum generalized to GROUPED axes. The group-window form's parallelism
    * is the GROUP count (3 flags ⇒ 3 tasks however wide the cluster);
    * here the level frame range-partitions on (group, value), each cell
    * computes its local cumsum, per-(cell, group) totals roll into
    * exclusive offsets via one window over the P-row cell axis, and
    * cum = offset + local — identical output (prefix sums are
    * boundary-invariant; x27's argument), P-way parallel. Equality with
    * the window form is asserted in CapabilitySpec; swap it into a
    * declared query when a level DOMAIN (not just the corpus) grows past
    * what one task should sort.
    */
  /** a22 with BOTH crossings routed through [[lowerMedianDistributed]] —
    * byte-identical output (CapabilitySpec proves the crossing equality;
    * the rest of the chain is shared code). MEASURED (tools/ProbeA22,
    * sf0.1, local[32], min-of-3): window 4.88 s vs distributed 7.12 s —
    * at a ~0.6 M-row level frame the two extra range shuffles +
    * materializations cost MORE than the 3-task crossing saves, so the
    * group-window form stays declared; the crossover needs a level DOMAIN
    * big enough that one task's sort dominates two shuffles (≳10⁷-10⁸
    * levels). Recorded so the swap threshold is a number, not a guess.
    */
  private[graft] def a22Distributed(s: SparkSession, d: String): DataFrame = {
    val lv = graft.Ckpt(Tables.lineitem(s, d)
      .select(col("l_returnflag"), dec2(col("l_extendedprice")).as("p"))
      .groupBy(col("l_returnflag"), col("p"))
      .agg(count(lit(1)).as("w")))
    val med = lowerMedianDistributed(lv, "p", "med")
    val dev = lv.join(med, Seq("l_returnflag"))
      .select(col("l_returnflag"), abs(col("p") - col("med")).as("dv"), col("w"))
      .groupBy(col("l_returnflag"), col("dv"))
      .agg(sum(col("w")).as("w"))
    lowerMedianDistributed(dev, "dv", "mad")
      .join(med, Seq("l_returnflag"))
      .select(col("l_returnflag"), out2(col("med")).as("median_price"),
        out2(col("mad")).as("mad"), col("med_n").as("n_items"))
      .orderBy("l_returnflag")
  }

  /** The range-partitioned two-phase cumulative-sum frame — the SCALE form
    * of the a20/a22 crossing (same columns as [[cumLevelsWindow]] plus the
    * internal cell tag; prefix sums are boundary-invariant so the cum/tot
    * values are byte-identical). */
  private[graft] def cumLevelsDistributed(levels: DataFrame,
      value: String): DataFrame = {
    val base = graft.Ckpt(
      levels.repartitionByRange(col("l_returnflag"), col(value))
        .withColumn("cell", spark_partition_id()))
    val wIn = Window.partitionBy("cell", "l_returnflag").orderBy(value)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = base.withColumn("cum_in", sum(col("w")).over(wIn))
    val wOff = Window.partitionBy("l_returnflag").orderBy("cell")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = base.groupBy(col("cell"), col("l_returnflag"))
      .agg(sum(col("w")).as("ctot"))
      .withColumn("off", sum(col("ctot")).over(wOff) - col("ctot"))
      .select(col("cell"), col("l_returnflag"), col("off"))
    val tots = base.groupBy(col("l_returnflag")).agg(sum(col("w")).as("tot"))
    within.join(offs, Seq("cell", "l_returnflag"))
      .join(tots, Seq("l_returnflag"))
      .withColumn("cum", col("off") + col("cum_in"))
  }

  private[graft] def lowerMedianDistributed(levels: DataFrame, value: String,
      out: String): DataFrame =
    cumLevelsDistributed(levels, value)
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(col("l_returnflag"))
      .agg(min(col(value)).as(out), max(col("tot")).as(out + "_n"))

  /** a23 — WINSORIZED MEAN per order priority: clamp o_totalprice to its
    * group's [P5, P95] (exact interpolated percentiles — a10's
    * `percentile` ≡ DuckDB `quantile_cont` parity) and average the
    * clamped values — the outlier-robust mean every metrics pipeline
    * prefers over a raw average.
    *
    * Determinism: the percentile bounds are 6-dp rounded on BOTH engines
    * before clamping (the interpolated value of 2-dp money at rank
    * fraction k∕20 is exact at 4 decimals, so the 6-dp round is far from
    * any boundary); clamped values quantize to DECIMAL(18,6) — exact, so
    * the SUM is order-free (D2) — and the mean is one double division,
    * 4-dp rounded (D4).
    *
    * Scale: one group-keyed percentile agg (5 rows out) + one equi-join
    * AQE broadcasts on its own (no hint — the build side is
    * aggregate-topped, r8's lint rule) + one keyed sum. Two scans of
    * orders, both pruned to 2 columns.
    */
  /** a24 — HERFINDAHL–HIRSCHMAN concentration of customer spend per
    * nation: HHI = Σ (cust_rev ∕ nation_rev)², the antitrust-grade
    * concentration index (w10's Pareto curve answers "how much do the top
    * k hold", this answers "how concentrated is the whole distribution"
    * in one number; 1∕n = perfectly even, 1 = monopsony).
    *
    * Exactness: HHI = (Σ revᵢ²) ∕ T² — the numerator sums SQUARED exact
    * DECIMAL(18,2) revenues (products exact at scale 4, order-free D2),
    * so the ONLY float math is the final stated-identically double
    * division (D4). Never a per-customer double share in sight.
    *
    * Scale: customer-keyed revenue agg → nation-keyed (Σrev, Σrev², n)
    * agg — two keyed shuffles, domain-bounded output.
    */
  def a24(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("c_custkey"))
      .agg(sum(dec2(col("o_totalprice"))).as("rev"))
    rev.groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_custs"),
        sum(col("rev")).as("t"),
        sum((col("rev") * col("rev")).cast("decimal(38,4)")).as("sq"))
      .select(col("nationkey"), col("n_custs"), out2(col("t")).as("total_rev"),
        round4nz(col("sq").cast("double")
          / (col("t").cast("double") * col("t").cast("double"))).as("hhi"))
      .orderBy("nationkey")
  }

  /** a25 — ARGMAX/ARGMIN + conditional/boolean aggregate batch per nation:
    * `max_by`/`min_by` (the SQL:2023 argmax family — "the customer who
    * holds the extreme balance", answered WITHOUT a self-join or window),
    * `count_if`, and `bool_and`/`bool_or` screens. The ordering key is a
    * COMPOSED exact integer — acctbal cents · 10⁸ + custkey — so the
    * argmax is total even where balances tie (sf0.1 has 8 tied
    * (nation, acctbal) pairs; a raw-balance max_by would be
    * non-deterministic there, D6's rule).
    *
    * Scale: ONE nation-keyed agg, all five aggregates mergeable partials
    * (argmax carries a single (key, value) pair per partial) — the same
    * one-shuffle shape as any keyed count, domain-bounded output.
    */
  def a25(s: SparkSession, d: String): DataFrame = {
    val ord = (dec2(col("c_acctbal")) * 100).cast("bigint") * lit(100000000L) +
      col("c_custkey")
    Tables.customer(s, d)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_custs"),
        max_by(col("c_name"), ord).as("rich_cust"),
        min_by(col("c_name"), ord).as("poor_cust"),
        count_if(col("c_acctbal") > 0).as("n_positive"),
        bool_and(col("c_acctbal") > -1000).as("all_above_floor"),
        bool_or(col("c_acctbal") > 9000).as("has_vip"))
      .orderBy("nationkey")
  }

  def a23(s: SparkSession, d: String): DataFrame = {
    val bounds = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(round(percentile(col("o_totalprice"), lit(0.05)), 6).as("p05"),
        round(percentile(col("o_totalprice"), lit(0.95)), 6).as("p95"))
    Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_totalprice"))
      .join(bounds, Seq("o_orderpriority"))
      .withColumn("wz",
        least(greatest(col("o_totalprice"), col("p05")), col("p95"))
          .cast("decimal(18,6)"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("p05")).as("p05"), min(col("p95")).as("p95"),
        round4nz(sum(col("wz")).cast("double")
          / count(lit(1)).cast("double")).as("wins_mean"))
      .orderBy("o_orderpriority")
  }

  /** a26 — DISCRETE (inverse-distribution) quantiles: per return flag, the
    * smallest l_quantity whose cumulative share reaches 25/50/75/95% —
    * `percentile_disc ... WITHIN GROUP`, the ANSI surface a10's continuous
    * `percentile` deliberately does not cover. Discrete quantiles SELECT an
    * input value instead of interpolating, so the output is exact integer
    * math end-to-end (l_quantity is integer-valued in the fixture; BIGINT
    * on both engines — no float boundary exists to misround). DuckDB twin:
    * `quantile_disc`, which implements the same cume_dist >= p selection.
    *
    * Scale: one flag-keyed aggregation; Spark evaluates percentile_disc as
    * a typed aggregate over the group's value counts — state is the
    * distinct-value histogram per group (50 quantities here), not the row
    * list, and the 3-flag axis is domain-bounded at any corpus.
    */
  def a26(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity").cast("bigint").as("q"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        // percentile_disc SELECTS an input value but returns DOUBLE; the
        // cast back to BIGINT is lossless (values are small integers)
        expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY q) AS BIGINT)").as("q25"),
        expr("CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY q) AS BIGINT)").as("q50"),
        expr("CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY q) AS BIGINT)").as("q75"),
        expr("CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY q) AS BIGINT)").as("q95"))
      .orderBy("l_returnflag")
}
