package graft.oracle

/** DuckDB oracle SQL — scans/filters (c), aggregation/sort/set ops (a) and window queries (w): one slice of [[OracleSql.sql]]
  * (round-13 split of the single 3.4k-line string table; every string
  * is unchanged — the driver hash gate is the no-drift proof).
  */
private[oracle] object OracleSqlCoreAggs {

  val sql: Map[String, String] = Map(


    "c1_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        | CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, ship_date""".stripMargin,


    "c2_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_extendedprice,
        | CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
        |  AND (l_quantity IN (1.0, 2.0, 3.0, 4.0, 5.0) OR l_extendedprice > 50000.0)
        |  AND l_returnflag LIKE 'N%'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, ship_date""".stripMargin,


    "a1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_base_price,
        | CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,


    "a2_distinct_agg" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
        | COUNT(DISTINCT l_suppkey) AS supp_cnt, COUNT(*) AS line_cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY order_year ORDER BY order_year""".stripMargin,


    "a3_rollup" ->
      """SELECT n_name, c_mktsegment,
        | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
        | COUNT(*) AS order_cnt,
        | CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS BIGINT) AS gid
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN orders ON o_custkey = c_custkey
        |GROUP BY ROLLUP(n_name, c_mktsegment)
        |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST, gid""".stripMargin,


    "a4_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS order_cnt,
        | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
        | CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, gid""".stripMargin,


    "a5_grouping_sets" ->
      """SELECT lang, source, COUNT(*) AS doc_cnt, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        | CAST(GROUPING(lang) * 2 + GROUPING(source) AS BIGINT) AS gid
        |FROM documents GROUP BY GROUPING SETS ((lang, source), (lang), ())
        |ORDER BY lang NULLS FIRST, source NULLS FIRST, gid""".stripMargin,


    "a6_sort_limit_offset" ->
      """SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS order_date
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 50 OFFSET 10""".stripMargin,


    "a7_union" ->
      """SELECT u.nationkey, ua.cnt
        |FROM (SELECT c_nationkey AS nationkey FROM customer
        |      UNION SELECT s_nationkey AS nationkey FROM supplier) u
        |JOIN (SELECT nationkey, COUNT(*) AS cnt
        |      FROM (SELECT c_nationkey AS nationkey FROM customer
        |            UNION ALL SELECT s_nationkey AS nationkey FROM supplier) t
        |      GROUP BY nationkey) ua USING (nationkey)
        |ORDER BY nationkey""".stripMargin,


    "a8_intersect" ->
      """SELECT p_brand FROM (
        | SELECT DISTINCT p_brand FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE EXTRACT(year FROM l_shipdate) = 1995
        | INTERSECT
        | SELECT DISTINCT p_brand FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE EXTRACT(year FROM l_shipdate) = 1996) t
        |ORDER BY p_brand""".stripMargin,


    "a9_except" ->
      """SELECT l_partkey FROM (
        | SELECT l_partkey FROM lineitem WHERE EXTRACT(year FROM l_shipdate) = 1995
        | EXCEPT
        | SELECT l_partkey FROM lineitem WHERE EXTRACT(year FROM l_shipdate) = 1996) t
        |ORDER BY l_partkey""".stripMargin,


    "a11_cond_agg" ->
      """SELECT n_name,
        | CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_f,
        | CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_o,
        | CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_p,
        | CAST(CAST(SUM(CASE WHEN o_totalprice > 200000.0 THEN CAST(o_totalprice AS DECIMAL(18,2))
        |          ELSE CAST(0.0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS DOUBLE) AS hi_value_revenue
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN orders ON o_custkey = c_custkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,


    "a12_stat_moments" ->
      """WITH g AS (SELECT l_returnflag, COUNT(*) AS n,
        |  SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |  SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |  SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS sxx,
        |  SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(18,4))) AS syy,
        |  SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,4))) AS sxy
        | FROM lineitem GROUP BY 1),
        | m AS (SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd,
        |  CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
        |  CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy,
        |  CAST(sxy AS DOUBLE) AS sxy FROM g)
        |SELECT l_returnflag, n,
        | ROUND((nd * sxy - sx * sy) / (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy)), 4) + 0.0 AS corr_qty_price,
        | ROUND((sxy - sx * sy / nd) / (nd - 1.0), 4) + 0.0 AS covar_samp,
        | ROUND(sqrt((nd * sxx - sx * sx) / (nd * (nd - 1.0))), 4) + 0.0 AS stddev_qty,
        | ROUND(sqrt((nd * syy - sy * sy) / (nd * (nd - 1.0))), 4) + 0.0 AS stddev_price
        |FROM m ORDER BY l_returnflag""".stripMargin,


    "a17_regression" ->
      """WITH t AS (SELECT c_mktsegment,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS x,
        |  o_totalprice AS y
        | FROM orders JOIN customer ON o_custkey = c_custkey),
        | g AS (SELECT c_mktsegment, COUNT(*) AS n,
        |  SUM(x) AS sx, SUM(CAST(y AS DECIMAL(18,2))) AS sy,
        |  SUM(x * x) AS sxx,
        |  SUM(CAST(y * y AS DECIMAL(18,4))) AS syy,
        |  SUM(CAST(x * y AS DECIMAL(18,4))) AS sxy
        | FROM t GROUP BY 1),
        | m AS (SELECT c_mktsegment, n, CAST(n AS DOUBLE) AS nd,
        |  CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
        |  CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy,
        |  CAST(sxy AS DOUBLE) AS sxy FROM g)
        |SELECT c_mktsegment, n,
        | ROUND((nd * sxy - sx * sy) / (nd * sxx - sx * sx), 4) + 0.0 AS slope,
        | ROUND((sy - ((nd * sxy - sx * sy) / (nd * sxx - sx * sx)) * sx) / nd, 4) + 0.0 AS intercept,
        | ROUND(((nd * sxy - sx * sy) * (nd * sxy - sx * sy))
        |   / ((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 4) + 0.0 AS r2
        |FROM m ORDER BY c_mktsegment""".stripMargin,


    "a13_unpivot" ->
      """WITH wide AS (SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p
        | FROM orders GROUP BY 1)
        |SELECT o_orderpriority, status, cnt FROM (
        | SELECT o_orderpriority, 'F' AS status, f AS cnt FROM wide
        | UNION ALL SELECT o_orderpriority, 'O', o FROM wide
        | UNION ALL SELECT o_orderpriority, 'P', p FROM wide) t
        |ORDER BY o_orderpriority, status""".stripMargin,


    "a10_median_pct" ->
      """SELECT lang, ROUND(quantile_cont(n_chars, 0.5), 2) AS p50,
        | ROUND(quantile_cont(n_chars, 0.9), 2) AS p90, COUNT(*) AS doc_cnt
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,


    "w1_rank_trio" ->
      """SELECT p_brand, p_partkey, p_retailprice,
        | CAST(row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS rn,
        | CAST(rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS INTEGER) AS rk,
        | CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS INTEGER) AS drk
        |FROM part ORDER BY p_brand, p_partkey""".stripMargin,


    "w2_topk_per_group" ->
      """SELECT p_brand, rn, p_partkey, p_retailprice FROM (
        | SELECT p_brand, p_partkey, p_retailprice,
        |  CAST(row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS rn
        | FROM part) t
        |WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin,


    "w3_running" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        | COUNT(*) OVER w AS running_cnt,
        | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DECIMAL(18,2)) AS DOUBLE) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        | ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,


    "w4_lag_lead" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts, event_type,
        | lag(event_type, 1) OVER w AS prev_type,
        | lead(event_type, 1) OVER w AS next_type,
        | (epoch_us(ts) - lag(epoch_us(ts), 1) OVER w) // 1000000 AS gap_sec
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |ORDER BY user_id, ts, event_id""".stripMargin,


    "w5_moving_avg" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS day_total
        |  FROM orders GROUP BY 1),
        | d2 AS (SELECT day, day_total,
        |   CAST(date_diff('day', DATE '1995-01-01', day) AS INTEGER) AS day_idx FROM daily)
        |SELECT day, CAST(day_total AS DOUBLE) AS day_total,
        | CAST(CAST(SUM(day_total) OVER (ORDER BY day_idx ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS DOUBLE) AS mov7_rows,
        | CAST(CAST(SUM(day_total) OVER (ORDER BY day_idx RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS DOUBLE) AS mov7_range
        |FROM d2 ORDER BY day""".stripMargin,


    "w7_value_picks" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        | o_totalprice,
        | first_value(o_totalprice) OVER w AS first_price,
        | last_value(o_totalprice) OVER w AS last_price,
        | nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        | ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,


    "w6_rank_stats" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        | CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        | ROUND(percent_rank() OVER w, 4) AS pct_rank,
        | ROUND(cume_dist() OVER w, 4) AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,



    "a14_pivot" ->
      """SELECT l_returnflag,
        | CAST(CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END)
        |  AS DECIMAL(18,2)) AS DOUBLE) AS F_qty,
        | COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS F_cnt,
        | CAST(CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END)
        |  AS DECIMAL(18,2)) AS DOUBLE) AS O_qty,
        | COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS O_cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,


    "a15_histogram" ->
      """SELECT LEAST(CAST(FLOOR(o_totalprice / 50000) AS BIGINT), 9) AS bucket,
        | COUNT(*) AS order_cnt,
        | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
        | CAST(CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS min_price,
        | CAST(CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS max_price
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,


    "a16_listagg" ->
      """SELECT r_name, COUNT(*) AS n_nations,
        | string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,


    // a18: same WITH RECURSIVE chain; DuckDB date+int ≡ Spark date_add
    "a18_calendar_fill" ->
      """WITH RECURSIVE days(day) AS (
        |  SELECT DATE '1995-01-01'
        |  UNION ALL SELECT day + 1 FROM days WHERE day < DATE '1995-03-31'),
        | daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    COUNT(*) AS n_orders
        |   FROM orders
        |   WHERE CAST(o_orderdate AS DATE)
        |     BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
        |   GROUP BY 1)
        |SELECT days.day, COALESCE(daily.n_orders, 0) AS n_orders,
        | CAST(daily.day IS NULL AS INT) AS is_gap
        |FROM days LEFT JOIN daily ON days.day = daily.day
        |ORDER BY days.day""".stripMargin,


    // w8: the distributed prefix-sum decile must equal the plain global
    // ntile window — the range partitioning is a PLAN property
    "w8_ntile_spend" ->
      """WITH spend AS (SELECT o_custkey,
        |   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders GROUP BY o_custkey),
        | t AS (SELECT o_custkey, spend,
        |   ntile(10) OVER (ORDER BY spend DESC, o_custkey) AS decile
        |  FROM spend)
        |SELECT CAST(decile AS INT) AS decile, COUNT(*) AS n_cust,
        | CAST(CAST(SUM(spend) AS DECIMAL(18,2)) AS DOUBLE) AS tot_spend,
        | CAST(MIN(spend) AS DOUBLE) AS min_spend,
        | CAST(MAX(spend) AS DOUBLE) AS max_spend
        |FROM t GROUP BY decile ORDER BY decile""".stripMargin,


    // a19: interpolation expression shape mirrored EXACTLY (one IEEE
    // association: ((nv-pv)*(i-pi))/(ni-pi) added to pv, then ROUND+0.0)
    "a19_interp_fill" ->
      """WITH RECURSIVE days(day) AS (
        |  SELECT DATE '1995-01-01'
        |  UNION ALL SELECT day + 1 FROM days WHERE day < DATE '1995-03-31'),
        | daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS v
        |   FROM orders
        |   WHERE CAST(o_orderdate AS DATE)
        |     BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
        |   GROUP BY 1),
        | g AS (SELECT days.day, CAST(daily.v AS DOUBLE) AS vd,
        |    CAST(days.day - DATE '1995-01-01' AS DOUBLE) AS i
        |   FROM days LEFT JOIN daily ON days.day = daily.day),
        | e AS (SELECT day, vd, i,
        |   last_value(vd IGNORE NULLS) OVER
        |    (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |   last_value(CASE WHEN vd IS NOT NULL THEN i END IGNORE NULLS) OVER
        |    (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pi,
        |   first_value(vd IGNORE NULLS) OVER
        |    (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |   first_value(CASE WHEN vd IS NOT NULL THEN i END IGNORE NULLS) OVER
        |    (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ni
        |  FROM g)
        |SELECT day, CAST(vd IS NOT NULL AS INT) AS obs,
        | ROUND(CASE WHEN vd IS NOT NULL THEN vd
        |   WHEN pv IS NOT NULL AND nv IS NOT NULL
        |    THEN pv + (nv - pv) * (i - pi) / (ni - pi)
        |   WHEN pv IS NOT NULL THEN pv
        |   WHEN nv IS NOT NULL THEN nv
        |   ELSE 0.0 END, 4) + 0.0 AS filled
        |FROM e ORDER BY day""".stripMargin,


    "w9_interval_range" ->
      """WITH daily AS (SELECT l_suppkey,
        |   CAST(l_shipdate AS DATE) AS d,
        |   COUNT(*) AS n,
        |   SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_suppkey, d, n,
        | CAST(SUM(n) OVER w AS BIGINT) AS n7,
        | CAST(CAST(SUM(rev) OVER w AS DECIMAL(18,2)) AS DOUBLE) AS rev7
        |FROM daily
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY d
        | RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, d""".stripMargin,


    // w12: TopKPerGroup's Rank ties mode is a PLAN property — the oracle
    // states the plain rank-filter window the tie-keeping operator must equal
    "w12_topk_ties" ->
      """WITH r AS (SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  RANK() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS rn
        | FROM lineitem)
        |SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity
        |FROM r WHERE rn <= 2
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,


    "w13_topk_dense" ->
      """WITH r AS (SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  DENSE_RANK() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC)
        |   AS rn
        | FROM lineitem)
        |SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity
        |FROM r WHERE rn <= 2
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,


    // a25: the argmax ordering key is COMPOSED exact-integer (cents·10⁸ +
    // custkey) so max_by/min_by are total even under tied balances (D6)
    "a25_agg_batch" ->
      """WITH c AS (SELECT c_nationkey, c_name, c_custkey, c_acctbal,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * 100000000
        |    + c_custkey AS ord
        | FROM customer)
        |SELECT c_nationkey AS nationkey, COUNT(*) AS n_custs,
        | max_by(c_name, ord) AS rich_cust, min_by(c_name, ord) AS poor_cust,
        | CAST(count_if(c_acctbal > 0) AS BIGINT) AS n_positive,
        | bool_and(c_acctbal > -1000) AS all_above_floor,
        | bool_or(c_acctbal > 9000) AS has_vip
        |FROM c GROUP BY c_nationkey ORDER BY nationkey""".stripMargin,


    "a20_weighted_median" ->
      """WITH pp AS (SELECT l_returnflag,
        |   CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
        |   SUM(CAST(l_quantity AS BIGINT)) AS w
        |  FROM lineitem GROUP BY 1, 2),
        | c AS (SELECT l_returnflag, price, w,
        |   SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |   SUM(w) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM pp),
        | k AS (SELECT l_returnflag,
        |   CAST(MIN(price) AS DOUBLE) AS wmedian,
        |   arg_min(cum, price) AS cum_at,
        |   MAX(tot) AS tot_w
        |  FROM c WHERE cum * 2 >= tot GROUP BY l_returnflag)
        |SELECT l_returnflag, wmedian, CAST(tot_w AS BIGINT) AS tot_w,
        | ROUND(CAST(cum_at AS DOUBLE) / CAST(tot_w AS DOUBLE), 4) AS cum_share
        |FROM k ORDER BY l_returnflag""".stripMargin,


    "a21_mode" ->
      """WITH c AS (SELECT user_id, event_type, COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        | p AS (SELECT user_id, event_type, cnt,
        |   ROW_NUMBER() OVER (PARTITION BY user_id
        |     ORDER BY cnt DESC, event_type) AS rn,
        |   SUM(cnt) OVER (PARTITION BY user_id) AS n_events
        |  FROM c)
        |SELECT user_id, event_type AS mode_type, cnt AS mode_cnt,
        | CAST(n_events AS BIGINT) AS n_events,
        | ROUND(CAST(cnt AS DOUBLE) / CAST(n_events AS DOUBLE), 4) AS mode_share
        |FROM p WHERE rn = 1 ORDER BY user_id""".stripMargin,


    "w10_pareto_share" ->
      """WITH rev AS (SELECT o_custkey,
        |   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        | tot AS (SELECT SUM(rev) AS tot FROM rev),
        | top AS (SELECT o_custkey, rev FROM rev
        |  ORDER BY rev DESC, o_custkey LIMIT 20),
        | r AS (SELECT o_custkey, rev,
        |   ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS rnk,
        |   SUM(rev) OVER (ORDER BY rev DESC, o_custkey
        |     ROWS UNBOUNDED PRECEDING) AS cum_rev
        |  FROM top)
        |SELECT rnk, o_custkey,
        | CAST(CAST(rev AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
        | ROUND(CAST(cum_rev AS DOUBLE) / CAST(tot AS DOUBLE), 4)
        |  AS cum_share
        |FROM r, tot ORDER BY rnk""".stripMargin,


    "a22_mad" ->
      """WITH lv AS (SELECT l_returnflag,
        |   CAST(l_extendedprice AS DECIMAL(18,2)) AS p, COUNT(*) AS w
        |  FROM lineitem GROUP BY 1, 2),
        | c1 AS (SELECT l_returnflag, p, w,
        |   SUM(w) OVER (PARTITION BY l_returnflag ORDER BY p
        |     ROWS UNBOUNDED PRECEDING) AS cum,
        |   SUM(w) OVER (PARTITION BY l_returnflag) AS tot FROM lv),
        | med AS (SELECT l_returnflag, MIN(p) AS med, MAX(tot) AS n
        |  FROM c1 WHERE cum * 2 >= tot GROUP BY 1),
        | dev AS (SELECT lv.l_returnflag, abs(lv.p - med.med) AS dv,
        |   SUM(lv.w) AS w
        |  FROM lv JOIN med ON lv.l_returnflag = med.l_returnflag
        |  GROUP BY 1, 2),
        | c2 AS (SELECT l_returnflag, dv, w,
        |   SUM(w) OVER (PARTITION BY l_returnflag ORDER BY dv
        |     ROWS UNBOUNDED PRECEDING) AS cum,
        |   SUM(w) OVER (PARTITION BY l_returnflag) AS tot FROM dev),
        | mad AS (SELECT l_returnflag, MIN(dv) AS mad
        |  FROM c2 WHERE cum * 2 >= tot GROUP BY 1)
        |SELECT med.l_returnflag,
        | CAST(CAST(med.med AS DECIMAL(18,2)) AS DOUBLE) AS median_price,
        | CAST(CAST(mad.mad AS DECIMAL(18,2)) AS DOUBLE) AS mad,
        | CAST(med.n AS BIGINT) AS n_items
        |FROM med JOIN mad ON med.l_returnflag = mad.l_returnflag
        |ORDER BY med.l_returnflag""".stripMargin,


    // a23: 6-dp-rounded quantile_cont bounds (≡ Spark percentile), exact
    // DECIMAL(18,6) clamped sums, one rounded double division
    "a23_winsorized" ->
      """WITH b AS (SELECT o_orderpriority,
        |   ROUND(quantile_cont(o_totalprice, 0.05), 6) AS p05,
        |   ROUND(quantile_cont(o_totalprice, 0.95), 6) AS p95
        |  FROM orders GROUP BY 1),
        | w AS (SELECT o.o_orderpriority, b.p05, b.p95,
        |   CAST(LEAST(GREATEST(o_totalprice, p05), p95)
        |     AS DECIMAL(18,6)) AS wz
        |  FROM orders o JOIN b ON o.o_orderpriority = b.o_orderpriority)
        |SELECT o_orderpriority, COUNT(*) AS n_orders,
        | MIN(p05) AS p05, MIN(p95) AS p95,
        | ROUND(CAST(SUM(wz) AS DOUBLE) / COUNT(*), 4) + 0.0 AS wins_mean
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,


    // w11: the oracle states the same plain window idiom — the heap
    // rewrite is a plan property, invisible in the result
    "w11_topk_plain" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t
        |WHERE rn <= 2 ORDER BY o_custkey, o_orderkey""".stripMargin,


    // a24: HHI = (Σ rev²) / T² — exact decimal sums, one double division
    "a24_hhi" ->
      """WITH rev AS (SELECT c_nationkey, c_custkey,
        |   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2)
        |SELECT c_nationkey AS nationkey, COUNT(*) AS n_custs,
        | CAST(CAST(SUM(rev) AS DECIMAL(18,2)) AS DOUBLE) AS total_rev,
        | ROUND(CAST(SUM(CAST(rev * rev AS DECIMAL(38,4))) AS DOUBLE)
        |   / (CAST(SUM(rev) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE)), 4)
        |   + 0.0 AS hhi
        |FROM rev GROUP BY 1 ORDER BY nationkey""".stripMargin,


    // a26: the oracle states percentile_disc BY DEFINITION (smallest value
    // with cumulative share >= p, integer compare — no builtin semantics
    // to trust on either engine; Spark's percentile_disc implements
    // exactly this cume_dist >= p selection)
    "a26_quantile_disc" ->
      """WITH v AS (SELECT l_returnflag AS f, CAST(l_quantity AS BIGINT) AS q
        |  FROM lineitem),
        | c AS (SELECT f, q, COUNT(*) AS n FROM v GROUP BY 1, 2),
        | cum AS (SELECT f, q,
        |   CAST(SUM(n) OVER (PARTITION BY f ORDER BY q) AS BIGINT) AS cum,
        |   CAST(SUM(n) OVER (PARTITION BY f) AS BIGINT) AS total
        |  FROM c)
        |SELECT f AS l_returnflag, MAX(total) AS n_rows,
        | MIN(CASE WHEN cum * 100 >= total * 25 THEN q END) AS q25,
        | MIN(CASE WHEN cum * 100 >= total * 50 THEN q END) AS q50,
        | MIN(CASE WHEN cum * 100 >= total * 75 THEN q END) AS q75,
        | MIN(CASE WHEN cum * 100 >= total * 95 THEN q END) AS q95
        |FROM cum GROUP BY f ORDER BY f""".stripMargin,
  )
}
