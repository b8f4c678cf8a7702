package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Det._

/** Event/stream processing, batch-equivalent formulations (SURVEY.md §2.6).
  * The same expressions run under Structured Streaming (see
  * `graft.streaming.StreamTwins`); these batch twins are the deterministic,
  * oracle-checkable surface. All event-time math follows the D3 ns protocol:
  * `ts` is int64 epoch-nanoseconds (see Tables.events), window bucketing is
  * integer division, and the oracle mirrors via `epoch_ns(ts)`.
  */
object Events {
  private val NsPerHour = 3600L * 1000000000L

  /** s1 — 1-hour tumbling window: count + decimal sum per event type.
    * Semantics of `window($"ts", "1 hour")` expressed as integer bucketing.
    */
  def s1(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("hour_idx", expr(s"ts div $NsPerHour"))
      .groupBy(col("hour_idx"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        out2(sum(dec2(col("value")))).as("sum_value"))
      .select(timestamp_seconds(col("hour_idx") * 3600).as("window_start"),
        col("event_type"), col("cnt"), col("sum_value"))
      .orderBy("window_start", "event_type")

  /** s2 — 1-hour windows sliding every 15 min (each event lands in exactly 4
    * windows): semantics of `window($"ts", "1 hour", "15 minutes")` via an
    * explicit slide-offset explode.
    */
  def s2(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("ts"))
      .withColumn("k", explode(sequence(lit(0L), lit(3L))))
      .withColumn("slot", expr("ts div 900000000000") - col("k"))
      .groupBy("slot")
      .agg(count(lit(1)).as("cnt"))
      .select(timestamp_seconds(col("slot") * 900).as("window_start"), col("cnt"))
      .orderBy("window_start")

  /** s3 — per-user session windows, 30-minute gap, via Spark's native
    * `session_window` (batch mode). Timestamps are µs-truncated from the ns
    * longs; the oracle's gaps-and-islands mirrors Spark's strict
    * `gap > 30 min` session-split rule (boundary verified, SURVEY §2.0).
    */
  def s3(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("tstamp", timestamp_micros(expr("ts div 1000")))
      .groupBy(col("user_id"), session_window(col("tstamp"), "30 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("cnt"))
      .orderBy("user_id", "session_start")

  /** s5 — conversion funnel: per user, first signup time, first purchase
    * time, and whether the user converted (a purchase at-or-after the first
    * signup). One keyed aggregation of conditional µs minima — pure integer
    * math, the standard event-analytics funnel at any scale.
    */
  def s5(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("us", expr("ts div 1000"))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("us"))).as("first_signup"),
        min(when(col("event_type") === "purchase", col("us"))).as("first_purchase"),
        count(lit(1)).as("event_cnt"))
      .withColumn("converted",
        when(col("first_signup").isNotNull && col("first_purchase").isNotNull
          && col("first_signup") <= col("first_purchase"), 1).otherwise(0))
      .orderBy("user_id")

  /** s4 — keep-first dedup per (user, event_type, minute): the deterministic
    * twin of `dropDuplicates` keyed by the ns timestamp + event id.
    */
  def s4(s: SparkSession, d: String): DataFrame = {
    // µs protocol for the emitted ts (DuckDB ≤1.0 truncates ns to µs on read).
    val w = Window.partitionBy("user_id", "event_type", "minute_idx")
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("ts", expr("ts div 1000"))
      .withColumn("minute_idx", expr("ts div 60000000"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        timestamp_seconds(col("minute_idx") * 60).as("minute_start"),
        col("event_id"), col("ts"))
      .orderBy("user_id", "event_type", "minute_start")
  }

  /** s6 — cohort retention: users cohorted by first-activity day, activity
    * counted per (cohort, day-offset) cell — the classic retention triangle.
    * Day indices are exact integer math on the µs longs (D3); the cohort is
    * a per-user window min (one keyed shuffle on user_id), the cell rollup a
    * second keyed shuffle — both on high-cardinality keys, so the plan holds
    * at 100 TB (no driver state, no per-day loop).
    */
  def s6(s: SparkSession, d: String): DataFrame = {
    val usPerDay = 86400L * 1000000L
    val wU = Window.partitionBy("user_id")
    Tables.events(s, d)
      .withColumn("day_idx", expr(s"(ts div 1000) div $usPerDay"))
      .withColumn("cohort_idx", min(col("day_idx")).over(wU))
      .withColumn("day_offset", col("day_idx") - col("cohort_idx"))
      .groupBy(col("cohort_idx"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"),
        count(lit(1)).as("event_cnt"))
      .select(asDate(timestamp_seconds(col("cohort_idx") * 86400)).as("cohort_day"),
        col("day_offset"), col("active_users"), col("event_cnt"))
      .orderBy("cohort_day", "day_offset")
  }

  /** s7 — daily + trailing-7-day rolling distinct active users (DAU/WAU),
    * the liveness dashboard every event pipeline feeds. A rolling DISTINCT
    * count fits no window frame (distinct state isn't mergeable across
    * frame slides), so each distinct (user, day) is exploded to the ≤ 7
    * trailing windows it covers — a bounded ×7 narrow fan-out whose
    * constant is the window width, never the data — and each cover day
    * takes one keyed count over the already-distinct (day, user) pairs.
    * Day indices are exact integer µs math (D3); output is restricted to
    * days with actual activity (the DAU side) like every dashboard shows.
    */
  def s7(s: SparkSession, d: String): DataFrame = {
    val usPerDay = 86400L * 1000000L
    val userDays = Tables.events(s, d)
      .select(col("user_id"), expr(s"(ts div 1000) div $usPerDay").as("day_idx"))
      .distinct()
    val dau = userDays.groupBy(col("day_idx")).agg(count(lit(1)).as("dau"))
    val wau = userDays
      .withColumn("cover_idx", explode(sequence(col("day_idx"), col("day_idx") + 6)))
      .select(col("cover_idx"), col("user_id")).distinct()
      .groupBy(col("cover_idx")).agg(count(lit(1)).as("wau"))
    dau.join(wau, col("day_idx") === col("cover_idx"))
      .select(asDate(timestamp_seconds(col("day_idx") * 86400)).as("day"),
        col("dau"), col("wau"))
      .orderBy("day")
  }

  /** s8 — event-type transition matrix (first-order Markov model of user
    * behavior — the statistic funnel and next-action analyses start from):
    * per (prev_type, next_type), the transition count and probability
    * P(next | prev) = cnt / from_cnt. Successor pairs come from `lag` over
    * each user's (µs ts, event_id) order — the same keyed window as w4 —
    * then two keyed aggs and a keyed join on prev_type. Counts are exact
    * longs, both < 2^53, so the probability quotient is bit-identical on
    * both engines; emitted 4-dp-rounded (D4). The matrix is
    * |event_types|² rows — bounded output at any corpus size.
    */
  def s8(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val tr = Tables.events(s, d)
      .withColumn("ts", expr("ts div 1000"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .select(col("prev_type"), col("event_type").as("next_type"))
    val tot = tr.groupBy(col("prev_type")).agg(count(lit(1)).as("from_cnt"))
    tr.groupBy(col("prev_type"), col("next_type")).agg(count(lit(1)).as("cnt"))
      .join(tot, Seq("prev_type"))
      .select(col("prev_type"), col("next_type"), col("cnt"),
        round4nz(col("cnt").cast("double") / col("from_cnt").cast("double"))
          .as("prob"))
      .orderBy("prev_type", "next_type")
  }

  /** s9 — per-event trailing-1-hour rate (burst / rate-limit detection —
    * the per-entity sliding statistic s2's fixed grid can't give you): for
    * every event, the count and decimal-exact value sum of the SAME user's
    * events in [ts − 1 h, ts]. This is the RANGE frame (w5's day-index
    * variant is an aggregated series; here the frame slides per raw event
    * over the physical time axis).
    *
    * Determinism: the frame is defined by the µs time VALUE, not row
    * position, so tied timestamps share one frame regardless of sort-order
    * tie-breaks; the frame SUM is over DECIMAL(12,2) (exact, order-free —
    * D2) and out-cast to double once. Scale shape: ONE keyed window
    * (shuffle on user_id, sort within partition) — no self-join, no
    * explode; Spark evaluates the sliding frame incrementally per
    * partition. A user's history must fit an executor's window buffer —
    * true of any per-entity window at any corpus size (entity skew, not
    * corpus size, is the limit; a pathological single-entity firehose
    * would salt the entity key by coarse time first).
    */
  def s9(s: SparkSession, d: String): DataFrame = {
    val usPerHour = 3600L * 1000000L
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-usPerHour, Window.currentRow)
    Tables.events(s, d)
      .withColumn("ts_us", expr("ts div 1000"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        count(lit(1)).over(w).as("cnt_1h"),
        sum(col("value").cast("decimal(12,2)")).over(w)
          .cast("double").as("val_1h"))
      .orderBy("event_id")
  }

  /** s10 — daily NEW vs RETURNING audience split + cumulative distinct
    * users (the growth curve every event dashboard leads with). A running
    * COUNT(DISTINCT) fits no window frame (s7's observation), but unlike
    * the rolling case it needs no fan-out at all: cumulative distinct users
    * at day D ≡ users whose FIRST day ≤ D — so the whole query is: distinct
    * (user, day) pairs, a per-user min-day agg, per-day counts of actives
    * and first-appearances, and one running sum over the BOUNDED day axis
    * (w5's safe-global-window note). Exact integer µs→day math (D3);
    * corpus-sized work is the keyed aggs.
    */
  def s10(s: SparkSession, d: String): DataFrame = {
    val usPerDay = 86400L * 1000000L
    val userDays = Tables.events(s, d)
      .select(col("user_id"), expr(s"(ts div 1000) div $usPerDay").as("day_idx"))
      .distinct()
    val dau = userDays.groupBy("day_idx").agg(count(lit(1)).as("dau"))
    val news = userDays.groupBy("user_id").agg(min(col("day_idx")).as("day_idx"))
      .groupBy("day_idx").agg(count(lit(1)).as("new_users"))
    val wCum = Window.orderBy("day_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dau.join(news, Seq("day_idx"), "left_outer")
      .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
      .withColumn("returning", col("dau") - col("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(wCum))
      .select(asDate(timestamp_seconds(col("day_idx") * 86400)).as("day"),
        col("dau"), col("new_users"), col("returning"), col("cum_users"))
      .orderBy("day")
  }

  /** s11 — per-user inter-arrival gap statistics (the activity-cadence
    * profile behind rate limiting, bot scoring and engagement models):
    * event count, min/max/total successive-gap µs and the mean gap.
    * Equal timestamps are ordered by event_id (D6) so the gap multiset is
    * deterministic; total_gap telescopes to span(last−first) and every
    * stat is exact integer µs except the mean — two correctly-rounded
    * double divisions of exact operands (D4, l8's argument). The mean is
    * reported in SECONDS, not µs: at µs magnitude (~5·10¹⁰) four decimal
    * places exceed double's 15–16 significant digits and the two engines'
    * ROUND implementations legitimately disagree in the last place
    * (observed at sf0.1); at seconds magnitude the 4-dp round is inside
    * the representable zone both engines agree on.
    *
    * Scale: one user-keyed window (lag) + one user-keyed agg; per-user
    * state is a single row. Nothing global until the output sort.
    */
  def s11(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"))
      .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("gap")).as("min_gap_us"),
        max(col("gap")).as("max_gap_us"),
        sum(col("gap")).as("total_gap_us"))
      .withColumn("avg_gap_s", round4fast(col("total_gap_us").cast("double")
        / (col("n_events") - 1).cast("double") / lit(1000000.0)))
      .select(col("user_id"), col("n_events"), col("min_gap_us"),
        col("max_gap_us"), col("total_gap_us"), col("avg_gap_s"))
      .orderBy("user_id")
  }

  /** s12 — MANUAL gap sessionization (s3 uses Spark's built-in
    * `session_window`; this is the portable window-function formulation
    * every warehouse runs, so the two can cross-check): a session breaks
    * when the gap since the user's previous event exceeds 30 min (strict >,
    * s3's boundary rule); session index = running sum of break flags;
    * per-session event count, start/end µs and duration. Equal timestamps
    * ordered by event_id (D6); all math exact integer µs (D3).
    *
    * Scale: one user-keyed window (lag + running sum — a single sort serves
    * both) and one (user, session)-keyed agg; no state beyond the sort.
    */
  def s12(s: SparkSession, d: String): DataFrame = {
    val gapUs = 30L * 60 * 1000000
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"))
      .withColumn("prev", lag(col("ts_us"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("ts_us") - col("prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("brk")).over(wRun))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("sess_start_us"),
        max(col("ts_us")).as("sess_end_us"))
      .withColumn("duration_us", col("sess_end_us") - col("sess_start_us"))
      .orderBy("user_id", "session_idx")
  }

  /** s13 — exact-arithmetic activity anomalies: a user's OBSERVED days whose
    * event count deviates from that user's mean by more than 2 population
    * standard deviations. The flag predicate never touches a float:
    * |x − μ| > 2σ  ⇔  (n·x − S)² > 4·(n·SS − S²)  with S = Σx, SS = Σx² —
    * pure integer compare, bit-identical on any engine (a sqrt/stddev
    * formulation would inherit each engine's float accumulation order).
    * Headroom: counts are per-user-day (≤10³ in any realistic stream), so
    * (n·x − S)² ≤ (10³·10³)² = 10¹² ≪ 2⁶³; the r7-style overflow margin
    * note applies if either factor grows 10⁴×.
    *
    * Scale: two keyed aggs (user×day counts, then per-user moment sums) +
    * one user-keyed join of the day frame against its own single-row
    * stats — nothing global until the output sort.
    */
  def s13(s: SparkSession, d: String): DataFrame = {
    val usPerDay = 86400L * 1000000L
    val daily = Tables.events(s, d)
      .select(col("user_id"), expr(s"(ts div 1000) div $usPerDay").as("day_idx"))
      .groupBy(col("user_id"), col("day_idx"))
      .agg(count(lit(1)).as("cnt"))
    val stats = daily.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_days"), sum(col("cnt")).as("s"),
        sum(col("cnt") * col("cnt")).as("ss"))
    val dev = col("n_days") * col("cnt") - col("s")
    daily.join(stats, Seq("user_id"))
      .filter(dev * dev > lit(4L) * (col("n_days") * col("ss") - col("s") * col("s")))
      .select(col("user_id"),
        asDate(timestamp_seconds(col("day_idx") * 86400)).as("day"),
        col("cnt"), col("n_days"), col("s").as("total_events"))
      .orderBy("user_id", "day")
  }

  /** s14 — OUT-OF-ORDER arrival audit (the batch twin of a streaming
    * watermark decision: how late do events actually arrive, per user?):
    * arrival order = event_id (unique, FixtureContractSpec); an event is
    * LATE when its timestamp sits more than 5 minutes behind the running
    * maximum of all prior arrivals. Per user: event count, late count, and
    * the worst regression in µs.
    *
    * Determinism: all integer ns/µs math on the epoch-ns longs (D3) —
    * running MAX over the unique event_id order, lateness threshold and
    * the µs floor-division exact on both engines; no float anywhere. One
    * user-keyed window + one user-keyed agg, corpus-linear; per-user
    * partition length is fixture-bounded (events per user ~constant
    * across SF).
    */
  def s14(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("prev_max", max("ts").over(w))
      .withColumn("late", col("prev_max").isNotNull &&
        col("prev_max") - col("ts") > lit(300000000000L)) // 5 min in ns
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        count(when(col("late"), 1)).as("n_late"),
        coalesce(max(when(col("late"),
          expr("(prev_max - ts) DIV 1000"))), lit(0L)).as("max_lag_us"))
      .orderBy("user_id")
  }

  /** s15 — activity STREAKS (gaps-and-islands, the one classic event-time
    * idiom the s-family hadn't declared): per user, total active days,
    * number of maximal consecutive-day runs, the longest run, and the
    * start date of the longest run (earliest start on ties). Island id =
    * day_idx − row_number over the per-user day order — consecutive days
    * share one id, a gap opens a new one.
    *
    * Determinism: pure integer day indices off the epoch-ns longs (s13's
    * day convention, D3) and a DATE emission — no float anywhere; the
    * longest-run start resolves ties by MIN(start), stated identically in
    * the oracle. Scale: one user-keyed distinct + one user-keyed window +
    * keyed aggs; per-user partition length is CALENDAR-bounded (distinct
    * active days ≤ days in the fixture window at any corpus size). The
    * streaks frame feeds two consumers (totals + longest-run start), so
    * it goes through [[graft.Ckpt]].
    */
  def s15(s: SparkSession, d: String): DataFrame = {
    val usPerDay = 86400L * 1000000L
    val days = Tables.events(s, d)
      .select(col("user_id"), expr(s"(ts div 1000) div $usPerDay").as("day_idx"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day_idx")
    val streaks = graft.Ckpt(days
      .withColumn("grp", col("day_idx") - row_number().over(w))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"), min("day_idx").as("start_idx")))
    val mx = streaks.groupBy("user_id")
      .agg(count(lit(1)).as("n_streaks"), sum(col("len")).as("n_active_days"),
        max(col("len")).as("max_streak"))
    val best = streaks
      .join(mx.select(col("user_id"), col("max_streak").as("ms")), Seq("user_id"))
      .filter(col("len") === col("ms"))
      .groupBy("user_id").agg(min("start_idx").as("bs"))
    mx.join(best, Seq("user_id"))
      .select(col("user_id"), col("n_active_days"), col("n_streaks"),
        col("max_streak"),
        asDate(timestamp_seconds(col("bs") * 86400)).as("streak_start"))
      .orderBy("user_id")
  }

  /** s16 — PEAK-HOUR concentration per event type (the diurnal-profile
    * audit behind capacity planning and bot detection — a type whose
    * traffic concentrates in one hour-of-day is a cron job, not people):
    * per type, total events, the modal hour of day (smallest hour on
    * ties), the modal hour's count, and its share of the type's traffic.
    *
    * Determinism: hour-of-day is pure integer math on the epoch-ns longs
    * ((ts div ns∕h) % 24, D3); the argmax resolves ties by hour, stated
    * identically in the oracle's ROW_NUMBER; the share is one
    * correctly-rounded double division, 4-dp (D4).
    *
    * Scale: one scan → one (type, hour)-keyed count (corpus-linear, the
    * only shuffle that sees data) → a 24-rows-per-type argmax window +
    * type-keyed rollup over a DOMAIN-bounded frame (|types|·24 rows at
    * any corpus).
    */
  def s16(s: SparkSession, d: String): DataFrame = {
    val perHour = Tables.events(s, d)
      .select(col("event_type"),
        expr(s"(ts div $NsPerHour) % 24").as("hod"))
      .groupBy("event_type", "hod")
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("cnt").desc, col("hod"))
    val tot = perHour.groupBy("event_type").agg(sum(col("cnt")).as("total"))
    perHour
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(tot, Seq("event_type"))
      .select(col("event_type"), col("total"),
        col("hod").cast("int").as("peak_hour"), col("cnt").as("peak_cnt"),
        graft.Det.round4nz(
          col("cnt").cast("double") / col("total").cast("double"))
          .as("peak_share"))
      .orderBy("event_type")
  }

  /** s17 — BURST DETECTION: per user, how many events start a "burst" —
    * three events from the same user inside a 5-minute span (the
    * bot/abuse-rate primitive every event pipeline screens with). An
    * event starts a burst iff the SECOND-following event (same user,
    * (ts, event_id) order — D6 tie rule) lands within 300 s, i.e.
    * `lead(ts, 2) − ts ≤ 3·10⁸ µs`; overlapping bursts each count (the
    * per-event definition both engines state identically — no
    * sessionization ambiguity).
    *
    * Scale: ONE user-keyed window (a single sort serves the lead) + one
    * user-keyed agg; per-user state is the 2-row lead buffer. Exact
    * integer µs end-to-end (D3), counts only (D2 trivially).
    */
  def s17(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"))
      .withColumn("t2", lead(col("ts_us"), 2).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        count(when(col("t2") - col("ts_us") <= lit(300000000L), 1))
          .as("n_bursts"))
      .orderBy("user_id")
  }

  /** s18 — CHURN / inactivity audit per user: hours since each user's last
    * event relative to the corpus's newest event, plus a 24-hour churned
    * flag (the fixture's activity window makes 24 h the discriminating
    * threshold — 17 of 150 users churn at sf0.01) — the retention-ops
    * counterpart of s6's cohort grid. The corpus max rides as a LAZY 1-row
    * aggregate frame crossJoined in (r8's round-11 discipline: a groupless
    * aggregate has a 1-row stats estimate, so the planner broadcasts it —
    * no driver-side `.head()`, no CartesianProduct).
    *
    * Scale: one user-keyed agg (count + max) + the 1-row broadcast join;
    * exact integer ns throughout, `DIV` floor division (D3); the boolean
    * flag and hour count are integer-derived on both engines. Output is
    * user-bounded.
    */
  def s18(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("user_id"), col("ts"))
    val mx = e.agg(max(col("ts")).as("corpus_max"))
    e.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"))
      .crossJoin(mx)
      .withColumn("hours_inactive",
        expr("(corpus_max - last_ts) DIV 3600000000000"))
      .select(col("user_id"), col("n_events"), col("hours_inactive"),
        (col("hours_inactive") >= 24).as("churned"))
      .orderBy("user_id")
  }

  /** s19 — per-event-type VALUE quantiles (p25/p50/p75/p95): the
    * distribution card ops dashboards keep per metric, completing a10's
    * percentile surface on the events axis. Values are 2-dp quantized
    * BEFORE the quantile (a23's exactness argument: interpolating 2-dp
    * inputs at quarter/20th rank fractions is exact at 4 decimals, so the
    * 6-dp round sits far from any boundary on both engines — Spark
    * `percentile` ≡ DuckDB `quantile_cont` under that discipline).
    *
    * Scale: one type-keyed exact-percentile agg (domain-bounded output);
    * at a true 100 TB metric stream the same card comes from
    * `approx_percentile` (capability tier) — the exact form is the
    * oracle-checkable declaration.
    */
  /** s20 — DAY-OF-WEEK activity profile per event type: the weekday/weekend
    * rhythm card (s16's hour-of-day sibling on the week axis). The weekday
    * is PURE INTEGER math on the epoch-ns long — `(epochDay + 3) mod 7`
    * with Monday = 0 (1970-01-01 was a Thursday) — so no calendar/timezone
    * function's engine semantics can drift the bucketing (UTC day
    * boundaries by construction). Share-of-type is one rounded double
    * division over exact longs (D4).
    *
    * Scale: one (type, dow)-keyed count over the corpus, then a window on
    * the AGGREGATED frame — |types|×7 rows, domain-bounded at any corpus.
    */
  def s20(s: SparkSession, d: String): DataFrame = {
    val cell = Tables.events(s, d)
      .select(col("event_type"),
        expr(s"((ts div ${24L * NsPerHour}) + 3) % 7").as("dow"))
      .groupBy("event_type", "dow")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type")
    cell
      .withColumn("type_total", sum(col("cnt")).over(w))
      .select(col("event_type"), col("dow").cast("int").as("dow"),
        col("cnt"), col("type_total"),
        graft.Det.round4nz(col("cnt").cast("double")
          / col("type_total").cast("double")).as("dow_share"))
      .orderBy("event_type", "dow")
  }

  def s19(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), graft.Det.dec2(col("value")).cast("double").as("v"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        round(percentile(col("v"), lit(0.25)), 6).as("p25"),
        round(percentile(col("v"), lit(0.5)), 6).as("p50"),
        round(percentile(col("v"), lit(0.75)), 6).as("p75"),
        round(percentile(col("v"), lit(0.95)), 6).as("p95"))
      .orderBy("event_type")

  /** s21 — per-TYPE adoption curve (s10's global new/cum-user card cut by
    * feature): for each event type, the day each user FIRST used it, then
    * daily new adopters and the running cumulative adopter count — the
    * feature-rollout curve every product-analytics stack draws. Day =
    * exact integer µs floor-div (D3); output day emitted as DATE.
    *
    * Scale: one (type, user)-keyed min-agg (corpus → |types|·|users|
    * rows), one (type, day)-keyed count, and a running-sum window on the
    * AGGREGATED |types|×|days| frame — domain-bounded, never corpus-wide
    * (a18/s10's argument). Nothing global until the output sort.
    */
  def s21(s: SparkSession, d: String): DataFrame = {
    val usPerDay = 86400L * 1000000L
    val first = Tables.events(s, d)
      .select(col("event_type"), col("user_id"),
        expr(s"(ts div 1000) div $usPerDay").as("day_idx"))
      .groupBy("event_type", "user_id")
      .agg(min(col("day_idx")).as("day_idx"))
    val w = Window.partitionBy("event_type").orderBy("day_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    first.groupBy("event_type", "day_idx")
      .agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .select(col("event_type"),
        asDate(timestamp_seconds(col("day_idx") * 86400)).as("day"),
        col("new_users"), col("cum_users"))
      .orderBy("event_type", "day")
  }

  /** s22 — FIRST-TOUCH / LAST-TOUCH ATTRIBUTION MATRIX: each user's first
    * and last event type (by (ts, event_id) — the house total order, D6)
    * paired into a (first_type, last_type) cell with user count, total
    * event mass, and the cell's share of all users — the entry→exit journey
    * card funnels (s5) and transitions (s8) don't state. Two user-keyed
    * windows + one keyed agg; the share window runs on the aggregated
    * cells (≤ |types|² = 100 rows, domain-bounded — never a data-sized
    * global window).
    */
  def s22(s: SparkSession, d: String): DataFrame = {
    val wAsc = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val perUser = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"))
      .withColumn("first_type", first(col("event_type")).over(wAsc))
      .withColumn("last_type", last(col("event_type")).over(wAsc))
      .groupBy(col("user_id"), col("first_type"), col("last_type"))
      .agg(count(lit(1)).as("n_events"))
    val wAll = Window.partitionBy()
    perUser
      .groupBy(col("first_type"), col("last_type"))
      .agg(count(lit(1)).as("n_users"), sum(col("n_events")).as("n_events"))
      .withColumn("user_share", graft.Det.round4nz(
        col("n_users").cast("double")
          / sum(col("n_users")).over(wAll).cast("double")))
      .orderBy("first_type", "last_type")
  }

  /** s23 — STICKINESS (DAU/MAU): daily actives over trailing-28-day
    * actives — the standard product-engagement ratio s7's 7-day card
    * stops short of. Same coverage-explode idiom as s7 with k = 28: each
    * (user, day) row covers the next 28 report days, then one distinct +
    * keyed count — the MAU side never recomputes a 28-day window per day.
    * Scale note: the explode is ×28 the distinct (user, day) frame
    * (corpus-linear with a constant the window length sets); at very long
    * windows the remedy is a day-keyed HLL sketch union (x35's mergeable
    * partials), traded here for exactness. Ratio = one exact-long double
    * division (D4).
    */
  def s23(s: SparkSession, d: String): DataFrame = {
    val usPerDay = 86400L * 1000000L
    val userDays = Tables.events(s, d)
      .select(col("user_id"), expr(s"(ts div 1000) div $usPerDay").as("day_idx"))
      .distinct()
    val dau = userDays.groupBy(col("day_idx")).agg(count(lit(1)).as("dau"))
    val mau = userDays
      .withColumn("cover_idx", explode(sequence(col("day_idx"), col("day_idx") + 27)))
      .select(col("cover_idx"), col("user_id")).distinct()
      .groupBy(col("cover_idx")).agg(count(lit(1)).as("mau"))
    dau.join(mau, col("day_idx") === col("cover_idx"))
      .select(asDate(timestamp_seconds(col("day_idx") * 86400)).as("day"),
        col("dau"), col("mau"),
        graft.Det.round4nz(col("dau").cast("double")
          / col("mau").cast("double")).as("stickiness"))
      .orderBy("day")
  }

  /** s24 — CONVERSION LAG distribution per signup-cohort week: among each
    * week's first-time signups, how many converted (first purchase at or
    * after first signup — s5's rule) and the p25/p50/p90 signup→purchase
    * latency in whole minutes. The activation-SPEED card growth teams read
    * beside s5's funnel (which only says how MANY convert).
    *
    * Determinism: firsts are conditional minima over exact integer µs (D3,
    * order-insensitive); lag minutes are integer division, so the discrete
    * quantiles SELECT an input integer (a26's percentile_disc discipline —
    * no float interpolation crosses the gate; unconverted users carry NULL
    * lag, which both engines' quantile skips); the rate is one exact-long
    * double division (D4).
    *
    * Scale: one user-keyed agg (map-side-combinable conditional minima) →
    * one week-keyed agg whose percentile state is bounded by the cohort's
    * distinct lag values; output ≤ |weeks| rows at any corpus.
    */
  def s24(s: SparkSession, d: String): DataFrame = {
    val usPerDay = 86400L * 1000000L
    Tables.events(s, d)
      .select(col("user_id"), expr("ts div 1000").as("us"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "signup", col("us"))).as("fs"),
        min(when(col("event_type") === "purchase", col("us"))).as("fp"))
      .filter(col("fs").isNotNull)
      .withColumn("lag_min",
        when(col("fp") >= col("fs"), expr("(fp - fs) div 60000000")))
      .groupBy(expr(s"(fs div $usPerDay) div 7").as("cohort_week"))
      .agg(count(lit(1)).as("n_users"),
        count(col("lag_min")).as("n_converted"),
        expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY lag_min) AS BIGINT)")
          .as("p25_lag_min"),
        expr("CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY lag_min) AS BIGINT)")
          .as("p50_lag_min"),
        expr("CAST(percentile_disc(0.90) WITHIN GROUP (ORDER BY lag_min) AS BIGINT)")
          .as("p90_lag_min"))
      .select(col("cohort_week"), col("n_users"), col("n_converted"),
        graft.Det.round4nz(col("n_converted").cast("double")
          / col("n_users").cast("double")).as("conv_rate"),
        col("p25_lag_min"), col("p50_lag_min"), col("p90_lag_min"))
      .orderBy("cohort_week")
  }

  /** EWMA weights in [[s25]], as exact integers 0.3·0.7^(k−1)·10⁷ for
    * k = 1..7 (mirrored as literals in the oracle and consumed by the
    * streaming twin — keep in sync). */
  private[graft] val EwmaWeights =
    Seq(3000000L, 2100000L, 1470000L, 1029000L, 720300L, 504210L, 352947L)

  /** s25 — EWMA ANOMALY card over the daily event series: each day's count
    * against the exponentially-weighted moving average of the PRIOR seven
    * series points (α = 0.3, weights renormalized over the points actually
    * present near the series head), flagged when the count exceeds twice
    * the smoothed level — the standard monitoring smoother beside s13's
    * per-user z-score rule (EWMA tracks level shifts a global σ misses).
    * Lags step over SERIES rows, i.e. days with ≥1 event; on the fixture
    * the day axis is dense so rows = calendar days.
    *
    * Determinism: the weights are the exact integers 0.3·0.7^(k−1)·10⁷
    * ([[EwmaWeights]]), so the weighted numerator and the present-weight
    * denominator are exact BIGINT lag() math (the 10⁷ scale cancels in
    * the ratio); ONE double division rounds the level (D4), and both the
    * spike predicate and the deviation ratio compare against the ROUNDED
    * level, so the engines decide identical flags. Day 1 has no history →
    * NULL level, flag 0. Headroom: daily count × 3·10⁶ must stay under
    * Long.Max — ~3·10¹² events/day; past that the numerator moves to
    * DECIMAL(38,0) unchanged in shape.
    *
    * Scale: the corpus-sized work is ONE keyed count; the partition-less
    * window runs over the DAILY aggregate — bounded by the calendar, not
    * the corpus (s13's argument).
    */
  def s25(s: SparkSession, d: String): DataFrame = {
    val usPerDay = 86400L * 1000000L
    val daily = Tables.events(s, d)
      .select(expr(s"(ts div 1000) div $usPerDay").as("day_idx"))
      .groupBy("day_idx").agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy("day_idx")
    val lags = EwmaWeights.indices.map(i => lag(col("cnt"), i + 1).over(w))
    val num = EwmaWeights.zip(lags).map { case (wt, l) =>
      coalesce(l * lit(wt), lit(0L)) }.reduce(_ + _)
    val den = EwmaWeights.zip(lags).map { case (wt, l) =>
      when(l.isNotNull, lit(wt)).otherwise(lit(0L)) }.reduce(_ + _)
    daily
      .withColumn("ewma", when(den > 0,
        round4nz(num.cast("double") / den.cast("double"))))
      .select(asDate(timestamp_seconds(col("day_idx") * 86400)).as("day"),
        col("cnt"), col("ewma"),
        when(col("ewma").isNotNull,
          round4nz(col("cnt").cast("double") / col("ewma"))).as("ratio"),
        when(col("ewma").isNotNull
          && col("cnt").cast("double") > lit(2.0) * col("ewma"), 1)
          .otherwise(0).as("is_spike"))
      .orderBy("day")
  }

  /** s26 — LINEAR multi-touch ATTRIBUTION: each purchase divides one unit
    * of conversion credit equally among the same user's click/view touches
    * in the prior 7 days (strictly before the purchase), rolled up per
    * touch type — the equal-weight model beside s22's first/last-touch
    * extremes (which hand the whole unit to one end of the path).
    *
    * Determinism: the lookback predicate is exact integer µs (D3); the
    * per-touch credit 1/n is quantized to 4 dp BEFORE summing (decimal
    * sums are order-insensitive — the x69 discipline), and the emitted
    * total re-rounds the exact decimal's double cast (D4).
    *
    * Scale: ONE user-keyed equi-join (both sides corpus-sized — sort-merge
    * on the natural user key; a bot-skewed user salts exactly like j13)
    * whose pair fan-out is bounded by purchases/user × touches-in-window,
    * then one per-conversion window count and one 3-row rollup. Never a
    * time-range self-join across users.
    */
  def s26(s: SparkSession, d: String): DataFrame = {
    val us7d = 7L * 86400L * 1000000L
    val ev = Tables.events(s, d).select(col("event_id"), col("user_id"),
      expr("ts div 1000").as("us"), col("event_type"))
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_id").as("t_id"),
        col("us").as("t_us"), col("event_type").as("touch_type"))
    val convs = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("c_id"), col("us").as("c_us"))
    val n = Window.partitionBy("c_id")
    convs.join(touches, Seq("user_id"))
      .filter(col("t_us") < col("c_us")
        && col("t_us") >= col("c_us") - lit(us7d))
      .withColumn("credit",
        round4fast(lit(1.0) / count(lit(1)).over(n).cast("double"))
          .cast("decimal(18,4)"))
      .groupBy("touch_type")
      // round AFTER the agg: round4fast references its input ~8 times, and
      // each reference of an in-agg sum() becomes its own aggregate
      // expression in the physical plan (plan-audit finding)
      .agg(countDistinct(col("t_id")).as("n_touches"),
        countDistinct(col("c_id")).as("n_conversions"),
        sum(col("credit")).as("credit_sum"))
      .select(col("touch_type"), col("n_touches"), col("n_conversions"),
        round4nz(col("credit_sum").cast("double")).as("total_credit"))
      .orderBy("touch_type")
  }

  /** s27 — strict SEQUENCE funnel with per-step deadlines (the
    * MATCH_RECOGNIZE / sessionized-pattern class; s5's funnel is
    * unordered signup→purchase with no time bound): per user, first
    * signup → first click STRICTLY after it within 24h → first purchase
    * strictly after THAT CLICK within 24h; stage rows carry user counts
    * and step conversion. The order-and-deadline contract is what
    * product funnels actually state, and it is NOT expressible as s5's
    * two conditional minima — the click's window anchors on the signup,
    * the purchase's on the qualifying click.
    *
    * Determinism: all exact integer µs (D3); firsts are conditional MINs
    * over a running per-user window min (order-insensitive aggregates
    * over a deterministic running frame ordered (us, event_id));
    * conversions are one rounded division each (D4), NULL at stage 1.
    *
    * Scale: ONE user-keyed running window + ONE user-keyed agg for
    * stages 1–2; stage 3 is one user-keyed equi-join against the
    * purchase slice (fan-out bounded by purchases/user) + agg; the
    * 3-row presentation explodes a 1-row global aggregate. No cross-user
    * work anywhere.
    */
  def s27(s: SparkSession, d: String): DataFrame = {
    val us24h = 86400L * 1000000L
    val ev = Tables.events(s, d).select(col("user_id"),
      expr("ts div 1000").as("us"), col("event_type"), col("event_id"))
    val wRun = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = ev.withColumn("run_fs",
      min(when(col("event_type") === "signup", col("us"))).over(wRun))
    val uc = staged.groupBy("user_id").agg(
      min(when(col("event_type") === "signup", col("us"))).as("fs"),
      min(when(col("event_type") === "click" && col("us") > col("run_fs")
        && col("us") <= col("run_fs") + us24h, col("us"))).as("fc"))
    val fp = uc.filter(col("fc").isNotNull)
      .join(ev.filter(col("event_type") === "purchase"), Seq("user_id"))
      .filter(col("us") > col("fc") && col("us") <= col("fc") + us24h)
      .groupBy("user_id").agg(min(col("us")).as("fp"))
    uc.join(fp, Seq("user_id"), "left_outer")
      .agg(count(col("fs")).as("n1"), count(col("fc")).as("n2"),
        count(col("fp")).as("n3"))
      .select(explode(array(
        struct(lit("1_signup").as("stage"), col("n1").as("n_users"),
          lit(null).cast("double").as("conv_from_prev")),
        struct(lit("2_click_24h").as("stage"), col("n2").as("n_users"),
          when(col("n1") > 0, round4nz(col("n2").cast("double")
            / col("n1").cast("double"))).as("conv_from_prev")),
        struct(lit("3_purchase_24h").as("stage"), col("n3").as("n_users"),
          when(col("n2") > 0, round4nz(col("n3").cast("double")
            / col("n2").cast("double"))).as("conv_from_prev")))).as("r"))
      .select(col("r.stage").as("stage"), col("r.n_users").as("n_users"),
        col("r.conv_from_prev").as("conv_from_prev"))
      .orderBy("stage")
  }
}
