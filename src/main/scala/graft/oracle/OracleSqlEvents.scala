package graft.oracle

/** DuckDB oracle SQL — event/stream batch twins (s): one slice of [[OracleSql.sql]]
  * (round-13 split of the single 3.4k-line string table; every string
  * is unchanged — the driver hash gate is the no-drift proof).
  */
private[oracle] object OracleSqlEvents {

  val sql: Map[String, String] = Map(


    "s1_tumbling" ->
      """SELECT CAST(to_timestamp(hour_idx * 3600) AS TIMESTAMP) AS window_start,
        | event_type, cnt, sum_value FROM (
        | SELECT epoch_ns(ts) // (3600 * 1000000000::BIGINT) AS hour_idx, event_type,
        |  COUNT(*) AS cnt,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
        | FROM events GROUP BY 1, 2) t
        |ORDER BY window_start, event_type""".stripMargin,


    "s2_sliding" ->
      """SELECT CAST(to_timestamp(slot * 900) AS TIMESTAMP) AS window_start, cnt FROM (
        | SELECT epoch_ns(ts) // (900 * 1000000000::BIGINT) - k AS slot, COUNT(*) AS cnt
        | FROM events, (SELECT unnest(range(4)) AS k) ks GROUP BY 1) t
        |ORDER BY window_start""".stripMargin,


    "s3_session" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us FROM events),
        | flagged AS (SELECT user_id, event_id, us,
        |   CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000
        |        THEN 1 ELSE 0 END AS new_s
        |  FROM ev),
        | isl AS (SELECT user_id, us,
        |   SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM flagged)
        |SELECT user_id, make_timestamp(MIN(us)) AS session_start,
        | make_timestamp(MAX(us) + 1800000000) AS session_end, COUNT(*) AS cnt
        |FROM isl GROUP BY user_id, island
        |ORDER BY user_id, session_start""".stripMargin,


    "s5_funnel" ->
      """SELECT user_id,
        | MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS first_signup,
        | MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_purchase,
        | COUNT(*) AS event_cnt,
        | CASE WHEN MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) IS NOT NULL
        |       AND MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) IS NOT NULL
        |       AND MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
        |        <= MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
        |      THEN 1 ELSE 0 END AS converted
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,


    "s4_dedup_first" ->
      """SELECT user_id, event_type,
        | CAST(to_timestamp(minute_idx * 60) AS TIMESTAMP) AS minute_start, event_id, ts
        |FROM (
        | SELECT user_id, event_type,
        |  epoch_us(ts) // (60 * 1000000::BIGINT) AS minute_idx,
        |  event_id, epoch_us(ts) AS ts,
        |  row_number() OVER (PARTITION BY user_id, event_type, epoch_us(ts) // (60 * 1000000::BIGINT)
        |    ORDER BY epoch_us(ts), event_id) AS rn
        | FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type, minute_start""".stripMargin,


    "s6_retention" ->
      """WITH e AS (SELECT user_id,
        |  epoch_us(ts) // (86400 * 1000000::BIGINT) AS day_idx FROM events),
        | c AS (SELECT user_id, day_idx,
        |  MIN(day_idx) OVER (PARTITION BY user_id) AS cohort_idx FROM e)
        |SELECT CAST(to_timestamp(cohort_idx * 86400) AS DATE) AS cohort_day,
        | day_idx - cohort_idx AS day_offset,
        | COUNT(DISTINCT user_id) AS active_users, COUNT(*) AS event_cnt
        |FROM c GROUP BY cohort_idx, day_offset ORDER BY cohort_day, day_offset""".stripMargin,


    // s14: all integer ns/µs math over the unique event_id arrival order
    "s14_late_events" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS tns FROM events),
        | r AS (SELECT user_id, event_id, tns,
        |   MAX(tns) OVER (PARTITION BY user_id ORDER BY event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM e),
        | l AS (SELECT user_id, tns, prev_max,
        |   (prev_max IS NOT NULL
        |     AND prev_max - tns > 300000000000) AS late FROM r)
        |SELECT user_id, COUNT(*) AS n_events,
        | COUNT(*) FILTER (WHERE late) AS n_late,
        | COALESCE(MAX(CASE WHEN late THEN (prev_max - tns) // 1000 END), 0)
        |  AS max_lag_us
        |FROM l GROUP BY user_id ORDER BY user_id""".stripMargin,


    "s7_rolling_active" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |  epoch_us(ts) // (86400 * 1000000::BIGINT) AS day_idx FROM events),
        | dau AS (SELECT day_idx, COUNT(*) AS dau FROM ud GROUP BY day_idx),
        | cover AS (SELECT DISTINCT day_idx + k AS cover_idx, user_id
        |  FROM ud, (SELECT unnest(range(7)) AS k) ks),
        | wau AS (SELECT cover_idx, COUNT(*) AS wau FROM cover GROUP BY cover_idx)
        |SELECT CAST(to_timestamp(day_idx * 86400) AS DATE) AS day, dau, wau
        |FROM dau JOIN wau ON day_idx = cover_idx ORDER BY day""".stripMargin,


    "s8_transitions" ->
      """WITH seq AS (SELECT user_id, event_type,
        |   LAG(event_type) OVER (PARTITION BY user_id
        |     ORDER BY epoch_us(ts), event_id) AS prev_type
        |  FROM events),
        | tr AS (SELECT prev_type, event_type AS next_type FROM seq
        |  WHERE prev_type IS NOT NULL),
        | tot AS (SELECT prev_type, COUNT(*) AS from_cnt FROM tr GROUP BY 1),
        | c AS (SELECT prev_type, next_type, COUNT(*) AS cnt FROM tr GROUP BY 1, 2)
        |SELECT c.prev_type, c.next_type, cnt,
        | ROUND(CAST(cnt AS DOUBLE) / CAST(from_cnt AS DOUBLE), 4) + 0.0 AS prob
        |FROM c JOIN tot USING (prev_type)
        |ORDER BY prev_type, next_type""".stripMargin,


    // s9: RANGE frame over the µs time value — tied timestamps share one
    // frame, so no ordering tie-break is needed; decimal-exact value sum
    "s9_rate_window" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        | COUNT(*) OVER w AS cnt_1h,
        | CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS val_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,


    // s19: values 2-dp quantized before the quantile (a23's exactness
    // argument), quantile_cont ≡ Spark percentile, 6-dp rounds
    "s19_value_quantiles" ->
      """WITH e AS (SELECT event_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS v FROM events)
        |SELECT event_type, COUNT(*) AS n_events,
        | ROUND(quantile_cont(v, 0.25), 6) AS p25,
        | ROUND(quantile_cont(v, 0.5), 6) AS p50,
        | ROUND(quantile_cont(v, 0.75), 6) AS p75,
        | ROUND(quantile_cont(v, 0.95), 6) AS p95
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,


    // s18: exact integer ns; // is DuckDB floor division ≡ Spark DIV on
    // the non-negative inactivity gap
    "s18_churn" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS tns FROM events),
        | m AS (SELECT MAX(tns) AS corpus_max FROM e),
        | u AS (SELECT user_id, COUNT(*) AS n_events, MAX(tns) AS last_ts
        |  FROM e GROUP BY user_id)
        |SELECT u.user_id, u.n_events,
        | (corpus_max - last_ts) // 3600000000000 AS hours_inactive,
        | (corpus_max - last_ts) // 3600000000000 >= 24 AS churned
        |FROM u, m ORDER BY u.user_id""".stripMargin,


    "s10_cum_users" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |   epoch_us(ts) // (86400 * 1000000::BIGINT) AS day_idx FROM events),
        | dau AS (SELECT day_idx, COUNT(*) AS dau FROM ud GROUP BY day_idx),
        | fd AS (SELECT user_id, MIN(day_idx) AS day_idx
        |  FROM ud GROUP BY user_id),
        | news AS (SELECT day_idx, COUNT(*) AS new_users
        |  FROM fd GROUP BY day_idx)
        |SELECT CAST(to_timestamp(day_idx * 86400) AS DATE) AS day, dau,
        | COALESCE(new_users, 0) AS new_users,
        | dau - COALESCE(new_users, 0) AS returning,
        | CAST(SUM(COALESCE(new_users, 0)) OVER (ORDER BY day_idx
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS cum_users
        |FROM dau LEFT JOIN news USING (day_idx) ORDER BY day""".stripMargin,


    "s11_gap_stats" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |  FROM events),
        | g AS (SELECT user_id,
        |   ts_us - LAG(ts_us) OVER (PARTITION BY user_id
        |     ORDER BY ts_us, event_id) AS gap
        |  FROM e)
        |SELECT user_id, COUNT(*) AS n_events,
        | MIN(gap) AS min_gap_us, MAX(gap) AS max_gap_us,
        | CAST(SUM(gap) AS BIGINT) AS total_gap_us,
        | ROUND(CAST(SUM(gap) AS DOUBLE)
        |   / CAST(COUNT(*) - 1 AS DOUBLE) / 1000000.0, 4) AS avg_gap_s
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,


    "s12_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |  FROM events),
        | b AS (SELECT user_id, event_id, ts_us,
        |   CASE WHEN LAG(ts_us) OVER w IS NULL
        |     OR ts_us - LAG(ts_us) OVER w > 1800000000 THEN 1 ELSE 0
        |   END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts_us, event_id)),
        | si AS (SELECT user_id, ts_us,
        |   SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS session_idx
        |  FROM b)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        | COUNT(*) AS n_events, MIN(ts_us) AS sess_start_us,
        | MAX(ts_us) AS sess_end_us,
        | MAX(ts_us) - MIN(ts_us) AS duration_us
        |FROM si GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin,


    "s13_anomaly_days" ->
      """WITH daily AS (SELECT user_id,
        |   epoch_us(ts) // (86400 * 1000000::BIGINT) AS day_idx,
        |   COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        | st AS (SELECT user_id, COUNT(*) AS n_days, SUM(cnt) AS s,
        |   SUM(cnt * cnt) AS ss
        |  FROM daily GROUP BY 1)
        |SELECT d.user_id,
        | CAST(to_timestamp(d.day_idx * 86400) AS DATE) AS day,
        | d.cnt, st.n_days, CAST(st.s AS BIGINT) AS total_events
        |FROM daily d JOIN st ON d.user_id = st.user_id
        |WHERE (st.n_days * d.cnt - st.s) * (st.n_days * d.cnt - st.s)
        |  > 4 * (st.n_days * st.ss - st.s * st.s)
        |ORDER BY d.user_id, day""".stripMargin,


    // s15: pure integer day indices (s13's day convention) + DATE emission;
    // longest-run start resolves ties by MIN(start) on both engines
    "s15_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |   epoch_us(ts) // (86400 * 1000000::BIGINT) AS day_idx
        |  FROM events),
        | isl AS (SELECT user_id, day_idx,
        |   day_idx - ROW_NUMBER() OVER (PARTITION BY user_id
        |     ORDER BY day_idx) AS grp FROM days),
        | streaks AS (SELECT user_id, grp, COUNT(*) AS len,
        |   MIN(day_idx) AS start_idx FROM isl GROUP BY user_id, grp),
        | mx AS (SELECT user_id, COUNT(*) AS n_streaks,
        |   CAST(SUM(len) AS BIGINT) AS n_active_days,
        |   MAX(len) AS max_streak FROM streaks GROUP BY user_id),
        | best AS (SELECT s.user_id, MIN(s.start_idx) AS bs
        |  FROM streaks s JOIN mx ON s.user_id = mx.user_id
        |    AND s.len = mx.max_streak GROUP BY s.user_id)
        |SELECT mx.user_id, mx.n_active_days, mx.n_streaks, mx.max_streak,
        | CAST(to_timestamp(best.bs * 86400) AS DATE) AS streak_start
        |FROM mx JOIN best ON mx.user_id = best.user_id
        |ORDER BY mx.user_id""".stripMargin,


    // s16: integer hour-of-day off the epoch-ns longs; argmax tie-broken
    // by hour via ROW_NUMBER; share is one rounded double division
    "s16_peak_hour" ->
      """WITH ph AS (SELECT event_type,
        |   (epoch_ns(ts) // (3600 * 1000000000::BIGINT)) % 24 AS hod,
        |   COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        | tot AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS total
        |  FROM ph GROUP BY event_type),
        | pk AS (SELECT event_type, hod, cnt,
        |   ROW_NUMBER() OVER (PARTITION BY event_type
        |     ORDER BY cnt DESC, hod) AS rn FROM ph)
        |SELECT pk.event_type, tot.total, CAST(pk.hod AS INT) AS peak_hour,
        | pk.cnt AS peak_cnt,
        | ROUND(CAST(pk.cnt AS DOUBLE) / CAST(tot.total AS DOUBLE), 4)
        |   + 0.0 AS peak_share
        |FROM pk JOIN tot ON pk.event_type = tot.event_type AND pk.rn = 1
        |ORDER BY pk.event_type""".stripMargin,


    // s17: per-event burst-start flag via lead(ts, 2); D6 tie order
    "s17_bursts" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |   FROM events),
        | l AS (SELECT user_id, ts_us,
        |   LEAD(ts_us, 2) OVER (PARTITION BY user_id
        |     ORDER BY ts_us, event_id) AS t2
        |  FROM e)
        |SELECT user_id, COUNT(*) AS n_events,
        | CAST(COUNT(CASE WHEN t2 - ts_us <= 300000000 THEN 1 END)
        |   AS BIGINT) AS n_bursts
        |FROM l GROUP BY user_id ORDER BY user_id""".stripMargin,


    // s20: weekday = pure integer math on epoch-ns ((epochDay + 3) mod 7,
    // Monday = 0) — no calendar function semantics on either engine
    "s20_dow_profile" ->
      """WITH c AS (SELECT event_type,
        |   ((epoch_ns(ts) // (86400 * 1000000000::BIGINT)) + 3) % 7 AS dow,
        |   COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(dow AS INT) AS dow, cnt,
        | CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT)
        |   AS type_total,
        | ROUND(CAST(cnt AS DOUBLE)
        |   / CAST(CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT)
        |       AS DOUBLE), 4) + 0.0 AS dow_share
        |FROM c ORDER BY event_type, dow""".stripMargin,


    // s21: s10's adoption card cut per event type; day = exact integer
    // µs floor-div (D3)
    "s21_type_adoption" ->
      """WITH f AS (SELECT event_type, user_id,
        |   MIN(epoch_us(ts) // (86400 * 1000000::BIGINT)) AS day_idx
        |  FROM events GROUP BY 1, 2),
        | d AS (SELECT event_type, day_idx, COUNT(*) AS new_users
        |  FROM f GROUP BY 1, 2)
        |SELECT event_type, CAST(to_timestamp(day_idx * 86400) AS DATE) AS day,
        | new_users,
        | CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day_idx
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS cum_users
        |FROM d ORDER BY event_type, day""".stripMargin,


    // s22: first/last by the (ts, event_id) total order (D6); the share
    // window runs over the <= |types|^2 aggregated cells
    "s22_first_touch" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |   epoch_us(ts) AS ts_us FROM events),
        | fl AS (SELECT user_id,
        |   FIRST_VALUE(event_type) OVER (PARTITION BY user_id
        |     ORDER BY ts_us, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |     AS first_type,
        |   LAST_VALUE(event_type) OVER (PARTITION BY user_id
        |     ORDER BY ts_us, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |     AS last_type
        |  FROM e),
        | pu AS (SELECT user_id, first_type, last_type, COUNT(*) AS n_events
        |  FROM fl GROUP BY 1, 2, 3),
        | cell AS (SELECT first_type, last_type, COUNT(*) AS n_users,
        |   CAST(SUM(n_events) AS BIGINT) AS n_events
        |  FROM pu GROUP BY 1, 2)
        |SELECT first_type, last_type, n_users, n_events,
        | ROUND(CAST(n_users AS DOUBLE)
        |   / CAST(SUM(n_users) OVER () AS DOUBLE), 4) AS user_share
        |FROM cell ORDER BY first_type, last_type""".stripMargin,


    // s23: s7's coverage-explode idiom at k = 28 + one exact ratio
    "s23_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |  epoch_us(ts) // (86400 * 1000000::BIGINT) AS day_idx FROM events),
        | dau AS (SELECT day_idx, COUNT(*) AS dau FROM ud GROUP BY day_idx),
        | cover AS (SELECT DISTINCT day_idx + k AS cover_idx, user_id
        |  FROM ud, (SELECT unnest(range(28)) AS k) ks),
        | mau AS (SELECT cover_idx, COUNT(*) AS mau FROM cover GROUP BY cover_idx)
        |SELECT CAST(to_timestamp(day_idx * 86400) AS DATE) AS day, dau, mau,
        | ROUND(CAST(dau AS DOUBLE) / mau, 4) AS stickiness
        |FROM dau JOIN mau ON day_idx = cover_idx ORDER BY day""".stripMargin,

    // s24: discrete quantiles restated via cumulative counts (a26's
    // discipline) over integer lag minutes; NULL lag (unconverted) is
    // excluded from the quantile mass exactly as percentile_disc skips it
    "s24_conversion_lag" ->
      """WITH u AS (SELECT user_id,
        |   MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS fs,
        |   MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS fp
        |  FROM events GROUP BY user_id),
        | lag AS (SELECT (fs // (86400 * 1000000::BIGINT)) // 7 AS cohort_week,
        |   CASE WHEN fp >= fs THEN (fp - fs) // 60000000 END AS lag_min
        |  FROM u WHERE fs IS NOT NULL),
        | base AS (SELECT cohort_week, COUNT(*) AS n_users,
        |   COUNT(lag_min) AS n_converted FROM lag GROUP BY cohort_week),
        | c AS (SELECT cohort_week, lag_min, COUNT(*) AS n FROM lag
        |  WHERE lag_min IS NOT NULL GROUP BY 1, 2),
        | cum AS (SELECT cohort_week, lag_min,
        |   CAST(SUM(n) OVER (PARTITION BY cohort_week ORDER BY lag_min) AS BIGINT) AS cum,
        |   CAST(SUM(n) OVER (PARTITION BY cohort_week) AS BIGINT) AS total
        |  FROM c),
        | q AS (SELECT cohort_week,
        |   MIN(CASE WHEN cum * 100 >= total * 25 THEN lag_min END) AS p25_lag_min,
        |   MIN(CASE WHEN cum * 100 >= total * 50 THEN lag_min END) AS p50_lag_min,
        |   MIN(CASE WHEN cum * 100 >= total * 90 THEN lag_min END) AS p90_lag_min
        |  FROM cum GROUP BY cohort_week)
        |SELECT b.cohort_week, b.n_users, b.n_converted,
        | ROUND(CAST(b.n_converted AS DOUBLE) / b.n_users, 4) + 0.0 AS conv_rate,
        | q.p25_lag_min, q.p50_lag_min, q.p90_lag_min
        |FROM base b LEFT JOIN q ON b.cohort_week = q.cohort_week
        |ORDER BY b.cohort_week""".stripMargin,

    // s25: EWMA weights are the exact integers 0.3*0.7^(k-1)*10^7
    // (Events.EwmaWeights — keep in sync); numerator/denominator are
    // exact BIGINT lag math, one rounded division, and both the ratio
    // and the spike flag compare against the ROUNDED level
    "s25_ewma_anomaly" ->
      """WITH daily AS (SELECT epoch_us(ts) // (86400 * 1000000::BIGINT)
        |   AS day_idx, COUNT(*) AS cnt FROM events GROUP BY 1),
        | lg AS (SELECT day_idx, cnt,
        |   lag(cnt, 1) OVER (ORDER BY day_idx) AS l1,
        |   lag(cnt, 2) OVER (ORDER BY day_idx) AS l2,
        |   lag(cnt, 3) OVER (ORDER BY day_idx) AS l3,
        |   lag(cnt, 4) OVER (ORDER BY day_idx) AS l4,
        |   lag(cnt, 5) OVER (ORDER BY day_idx) AS l5,
        |   lag(cnt, 6) OVER (ORDER BY day_idx) AS l6,
        |   lag(cnt, 7) OVER (ORDER BY day_idx) AS l7
        |  FROM daily),
        | lv AS (SELECT day_idx, cnt,
        |   CAST(COALESCE(l1 * 3000000, 0) + COALESCE(l2 * 2100000, 0)
        |    + COALESCE(l3 * 1470000, 0) + COALESCE(l4 * 1029000, 0)
        |    + COALESCE(l5 * 720300, 0) + COALESCE(l6 * 504210, 0)
        |    + COALESCE(l7 * 352947, 0) AS BIGINT) AS num,
        |   CAST(CASE WHEN l1 IS NULL THEN 0 ELSE 3000000 END
        |    + CASE WHEN l2 IS NULL THEN 0 ELSE 2100000 END
        |    + CASE WHEN l3 IS NULL THEN 0 ELSE 1470000 END
        |    + CASE WHEN l4 IS NULL THEN 0 ELSE 1029000 END
        |    + CASE WHEN l5 IS NULL THEN 0 ELSE 720300 END
        |    + CASE WHEN l6 IS NULL THEN 0 ELSE 504210 END
        |    + CASE WHEN l7 IS NULL THEN 0 ELSE 352947 END AS BIGINT) AS den
        |  FROM lg),
        | ew AS (SELECT day_idx, cnt, CASE WHEN den > 0 THEN
        |    ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 4) + 0.0
        |   END AS ewma FROM lv)
        |SELECT CAST(to_timestamp(day_idx * 86400) AS DATE) AS day, cnt, ewma,
        | CASE WHEN ewma IS NOT NULL
        |  THEN ROUND(CAST(cnt AS DOUBLE) / ewma, 4) + 0.0 END AS ratio,
        | CASE WHEN ewma IS NOT NULL AND CAST(cnt AS DOUBLE) > 2.0 * ewma
        |  THEN 1 ELSE 0 END AS is_spike
        |FROM ew ORDER BY day""".stripMargin,

    // s26: the per-touch credit 1/n is quantized to 4 dp BEFORE the
    // decimal sum (x69's exact-sum discipline); 1.0 must be cast to
    // DOUBLE (a bare 1.0 is DECIMAL in DuckDB and decimal division
    // truncates differently)
    "s26_linear_attribution" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type
        |  FROM events),
        | t AS (SELECT user_id, event_id AS t_id, us AS t_us,
        |   event_type AS touch_type FROM ev
        |  WHERE event_type IN ('click', 'view')),
        | c AS (SELECT user_id, event_id AS c_id, us AS c_us FROM ev
        |  WHERE event_type = 'purchase'),
        | pr AS (SELECT t.touch_type, t.t_id, c.c_id,
        |   COUNT(*) OVER (PARTITION BY c.c_id) AS n
        |  FROM c JOIN t ON c.user_id = t.user_id
        |   AND t.t_us < c.c_us AND t.t_us >= c.c_us - 604800000000)
        |SELECT touch_type,
        | CAST(COUNT(DISTINCT t_id) AS BIGINT) AS n_touches,
        | CAST(COUNT(DISTINCT c_id) AS BIGINT) AS n_conversions,
        | ROUND(CAST(SUM(CAST(ROUND(CAST(1.0 AS DOUBLE) / n, 4)
        |   AS DECIMAL(18,4))) AS DOUBLE), 4) + 0.0 AS total_credit
        |FROM pr GROUP BY touch_type ORDER BY touch_type""".stripMargin,

    // s27: the click window anchors on the running signup min (a window
    // over the per-user event stream), the purchase window on the
    // qualifying click — the strict-order funnel s5's unordered minima
    // cannot state
    "s27_sequence_funnel" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us, event_type, event_id
        |  FROM events),
        | st AS (SELECT user_id, us, event_type,
        |   MIN(CASE WHEN event_type = 'signup' THEN us END)
        |    OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS UNBOUNDED PRECEDING) AS run_fs FROM ev),
        | uc AS (SELECT user_id,
        |   MIN(CASE WHEN event_type = 'signup' THEN us END) AS fs,
        |   MIN(CASE WHEN event_type = 'click' AND us > run_fs
        |        AND us <= run_fs + 86400000000 THEN us END) AS fc
        |  FROM st GROUP BY user_id),
        | fp AS (SELECT u.user_id, MIN(e.us) AS fp
        |  FROM uc u JOIN ev e ON e.user_id = u.user_id
        |   AND e.event_type = 'purchase' AND u.fc IS NOT NULL
        |   AND e.us > u.fc AND e.us <= u.fc + 86400000000
        |  GROUP BY u.user_id),
        | c AS (SELECT COUNT(u.fs) AS n1, COUNT(u.fc) AS n2,
        |   COUNT(f.fp) AS n3
        |  FROM uc u LEFT JOIN fp f ON u.user_id = f.user_id)
        |SELECT * FROM (
        | SELECT '1_signup' AS stage, CAST(n1 AS BIGINT) AS n_users,
        |   CAST(NULL AS DOUBLE) AS conv_from_prev FROM c
        | UNION ALL SELECT '2_click_24h', CAST(n2 AS BIGINT),
        |   CASE WHEN n1 > 0
        |    THEN ROUND(CAST(n2 AS DOUBLE) / n1, 4) + 0.0 END FROM c
        | UNION ALL SELECT '3_purchase_24h', CAST(n3 AS BIGINT),
        |   CASE WHEN n2 > 0
        |    THEN ROUND(CAST(n3 AS DOUBLE) / n2, 4) + 0.0 END FROM c) z
        |ORDER BY stage""".stripMargin,
  )
}
