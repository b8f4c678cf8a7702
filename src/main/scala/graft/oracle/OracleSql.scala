package graft.oracle

/** DuckDB oracle SQL, one entry per declared query (SURVEY.md §2.9).
  *
  * Every string mirrors its Spark twin under the determinism rules D1–D8:
  * identical column names/order, decimal casts before aggregation, dates as
  * DATE, event-time math on `epoch_ns(ts)` int64 (the Spark side reads ns
  * parquet as LongType), floats rounded to 4 dp and ranked by the rounded
  * value, explicit NULLS FIRST on nullable sort keys.
  */
object OracleSql {

  /** x1's candidate-generation CTE chain, shared verbatim by x17 (which
    * rolls the same verified pairs up per source pair) so the two oracles
    * can never drift apart.
    */
  private val x1Ctes =
    """WITH toks AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS t FROM documents),
      | sig AS (SELECT doc_id, lang,
      |  list_aggregate(list_transform(t, x -> md5('0:' || x)), 'min') AS mh0,
      |  list_aggregate(list_transform(t, x -> md5('1:' || x)), 'min') AS mh1,
      |  list_aggregate(list_transform(t, x -> md5('2:' || x)), 'min') AS mh2,
      |  list_aggregate(list_transform(t, x -> md5('3:' || x)), 'min') AS mh3,
      |  list_aggregate(list_transform(t, x -> md5('4:' || x)), 'min') AS mh4,
      |  list_aggregate(list_transform(t, x -> md5('5:' || x)), 'min') AS mh5,
      |  list_aggregate(list_transform(t, x -> md5('6:' || x)), 'min') AS mh6,
      |  list_aggregate(list_transform(t, x -> md5('7:' || x)), 'min') AS mh7
      |  FROM toks),
      | bands AS (
      |  SELECT doc_id, lang, 0 AS pos, md5(mh0 || mh1) AS bh FROM sig
      |  UNION ALL SELECT doc_id, lang, 1, md5(mh2 || mh3) FROM sig
      |  UNION ALL SELECT doc_id, lang, 2, md5(mh4 || mh5) FROM sig
      |  UNION ALL SELECT doc_id, lang, 3, md5(mh6 || mh7) FROM sig),
      | cand AS (SELECT DISTINCT a.lang, a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM bands a JOIN bands b ON a.lang = b.lang AND a.pos = b.pos
      |   AND a.bh = b.bh AND a.doc_id < b.doc_id)""".stripMargin

  /** x13's scoring CTE chain (through a per-doc `scored` frame), shared
    * verbatim by x33's bucketing rollup so the two oracles cannot drift.
    */
  private val x13Ctes =
    """WITH sp AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      | bi AS (SELECT doc_id,
      |   unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
      |   unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
      |  FROM sp),
      | c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2),
      | c1 AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY 1),
      | v AS (SELECT COUNT(DISTINCT w) AS vocab
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)),
      | sc AS (SELECT doc_id,
      |   CAST(ROUND(ln((c12.c12 + 1.0) / (c1.c1 + vocab)), 9) AS DECIMAL(18,9)) AS logp
      |  FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v),
      | scored AS (SELECT doc_id, COUNT(*) AS n_bigrams,
      |  ROUND(CAST(SUM(logp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4) + 0.0 AS avg_logp
      |  FROM sc GROUP BY doc_id)""".stripMargin

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

    "j1_inner_equi" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "j2_broadcast" ->
      """SELECT l_orderkey, l_linenumber, p_name, s_name
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        | JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY l_orderkey, l_linenumber, p_name, s_name""".stripMargin,

    "j3_star_5way" ->
      """SELECT n_name,
        | CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
        | COUNT(*) AS line_cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND EXTRACT(year FROM o_orderdate) = 1996
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "j4_left_outer" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS order_cnt
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    "j5_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    "j6_anti" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND EXTRACT(year FROM o_orderdate) = 1995)
        |ORDER BY c_custkey""".stripMargin,

    "j7_full_outer" ->
      """SELECT COALESCE(cn.c_nationkey, sn.s_nationkey) AS nationkey,
        | cn.cust_cnt, sn.supp_cnt
        |FROM (SELECT c_nationkey, COUNT(*) AS cust_cnt FROM customer GROUP BY c_nationkey) cn
        |FULL JOIN (SELECT s_nationkey, COUNT(*) AS supp_cnt FROM supplier GROUP BY s_nationkey) sn
        | ON cn.c_nationkey = sn.s_nationkey
        |ORDER BY nationkey""".stripMargin,

    "j8_theta_range" ->
      """SELECT r_regionkey, n_nationkey, r_name, n_name
        |FROM region JOIN nation ON r_regionkey < n_regionkey
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,

    "j9_asof" ->
      """SELECT event_id, user_id, purchase_ts, signup_event_id, signup_ts FROM (
        | SELECT p.event_id, p.user_id, epoch_us(p.ts) AS purchase_ts,
        |  s.event_id AS signup_event_id, epoch_us(s.ts) AS signup_ts,
        |  row_number() OVER (PARTITION BY p.event_id
        |    ORDER BY epoch_us(s.ts) DESC, s.event_id DESC) AS rn
        | FROM events p JOIN events s
        |  ON p.user_id = s.user_id AND epoch_us(s.ts) <= epoch_us(p.ts)
        |   AND s.event_type = 'signup'
        | WHERE p.event_type = 'purchase') t
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "j10_cross" ->
      """SELECT r_regionkey, n_nationkey, r_name, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,

    "j11_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2))
        |    * (SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
        |  > (SELECT SUM(CAST(i.o_totalprice AS DECIMAL(18,2)))
        |     FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "j12_lateral_topn" ->
      """SELECT n_name, t.c_custkey, t.c_acctbal
        |FROM nation,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer
        |         WHERE c_nationkey = n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 3) t
        |ORDER BY n_name, t.c_custkey""".stripMargin,

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

    "f7_string2" ->
      """SELECT p_partkey, reverse(p_name) AS rev_name,
        | translate(p_type, 'EOC', 'eoc') AS xlated,
        | repeat(p_brand, 2) AS brand2,
        | contains(p_name, 'ring') AS has_ring,
        | CAST(strpos(p_name, 'o') AS INTEGER) AS o_pos
        |FROM part ORDER BY p_partkey""".stripMargin,

    "f8_json_keys" ->
      """SELECT key, COUNT(*) AS cnt,
        | CAST(SUM(CAST(json_extract_string(props, '$.' || key) AS BIGINT)) AS BIGINT) AS sum_val
        |FROM (SELECT unnest(json_keys(props)) AS key, props FROM events) t
        |GROUP BY key ORDER BY key""".stripMargin,

    "r1_triples_view" ->
      """WITH t AS (
        | SELECT c_custkey AS s, 'name' AS p, c_name AS o FROM customer
        | UNION ALL SELECT c_custkey, 'nationkey', CAST(c_nationkey AS VARCHAR) FROM customer
        | UNION ALL SELECT c_custkey, 'mktsegment', c_mktsegment FROM customer)
        |SELECT p, COUNT(*) AS cnt, COUNT(DISTINCT o) AS distinct_o
        |FROM t GROUP BY p ORDER BY p""".stripMargin,

    "r2_star_bgp" ->
      """WITH t AS (
        | SELECT c_custkey AS s, 'name' AS p, c_name AS o FROM customer
        | UNION ALL SELECT c_custkey, 'nationkey', CAST(c_nationkey AS VARCHAR) FROM customer
        | UNION ALL SELECT c_custkey, 'mktsegment', c_mktsegment FROM customer)
        |SELECT n1.s AS custkey, n1.o AS c_name, seg.o AS mktsegment, n_name
        |FROM t n1
        | JOIN t seg ON n1.s = seg.s AND n1.p = 'name' AND seg.p = 'mktsegment'
        | JOIN t nk ON n1.s = nk.s AND nk.p = 'nationkey'
        | JOIN nation ON CAST(nk.o AS INTEGER) = n_nationkey
        |ORDER BY custkey""".stripMargin,

    "r3_path_join" ->
      """WITH ct AS (SELECT c_custkey AS s, CAST(c_nationkey AS VARCHAR) AS o FROM customer),
        | nt AS (SELECT CAST(n_nationkey AS BIGINT) AS s, CAST(n_regionkey AS VARCHAR) AS o FROM nation),
        | rt AS (SELECT CAST(r_regionkey AS BIGINT) AS s, r_name AS o FROM region)
        |SELECT ct.s AS custkey, CAST(ct.o AS BIGINT) AS nationkey, rt.o AS region_name
        |FROM ct JOIN nt ON CAST(ct.o AS BIGINT) = nt.s
        | JOIN rt ON CAST(nt.o AS BIGINT) = rt.s
        |ORDER BY custkey""".stripMargin,

    "r4_optional_bgp" ->
      """WITH names AS (SELECT c_custkey AS custkey, c_name FROM customer),
        | links AS (SELECT o_orderkey AS order_s, CAST(CAST(o_custkey AS VARCHAR) AS BIGINT) AS cust_o
        |  FROM orders)
        |SELECT n.custkey, n.c_name, COUNT(l.order_s) AS order_cnt
        |FROM names n LEFT JOIN links l ON n.custkey = l.cust_o
        |GROUP BY n.custkey, n.c_name
        |ORDER BY custkey""".stripMargin,

    "r5_property_path" ->
      """WITH RECURSIVE edges AS (
        |  SELECT 'c' || c_custkey AS src, 'n' || c_nationkey AS dst FROM customer
        |  UNION ALL
        |  SELECT 'n' || n_nationkey, 'r' || n_regionkey FROM nation),
        | paths(src, dst, depth) AS (
        |  SELECT src, dst, 1 FROM edges
        |  UNION ALL
        |  SELECT p.src, e.dst, p.depth + 1 FROM paths p JOIN edges e ON p.dst = e.src
        |   WHERE p.depth < 4)
        |SELECT src, dst, CAST(MIN(depth) AS INTEGER) AS depth
        |FROM paths GROUP BY src, dst ORDER BY src, dst""".stripMargin,

    "f1_string" ->
      """SELECT c_custkey, upper(c_name) AS uname, lower(c_mktsegment) AS lseg,
        | substr(c_name, 1, 8) AS name8, CAST(length(c_name) AS INTEGER) AS name_len,
        | c_name || '@' || c_mktsegment AS tagged,
        | replace(c_name, 'Customer', 'Cust') AS shortname,
        | lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS idpad,
        | trim('  pad  ') AS trimmed,
        | CAST(len(string_split(c_name, '#')) AS INTEGER) AS split_n,
        | regexp_extract(c_name, '([0-9]+)', 1) AS digits
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "f2_date" ->
      """SELECT o_orderkey,
        | CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
        | CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mo,
        | CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS qtr,
        | CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
        | CAST(o_orderdate AS DATE) + 30 AS plus30,
        | CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
        | last_day(CAST(o_orderdate AS DATE)) AS month_end,
        | CAST(EXTRACT(dow FROM o_orderdate) + 1 AS INTEGER) AS dow
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f3_math" ->
      """SELECT l_orderkey, l_linenumber,
        | ROUND(l_extendedprice * 0.01, 4) AS price_k,
        | CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        | CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
        | ROUND(abs(l_discount - 0.05), 4) AS disc_dev,
        | ROUND(sqrt(l_quantity), 4) AS qty_sqrt,
        | ROUND(ln(l_extendedprice), 4) AS price_ln,
        | ROUND(exp(l_discount), 4) AS disc_exp,
        | ROUND(pow(l_tax + 1.0, 2.0), 4) AS tax_sq,
        | l_orderkey % 7 AS okey_mod
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, price_k, qty_sqrt, disc_dev, tax_sq""".stripMargin,

    "f4_array" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
        |SELECT vec_id, CAST(len(emb) AS INTEGER) AS dim,
        | ROUND(emb[1], 4) + 0.0 AS first_val,
        | CAST(len(list_filter(emb, x -> x > 0.0)) AS INTEGER) AS pos_cnt,
        | ROUND(list_sum(list_transform(emb, x -> abs(x))), 4) AS l1,
        | ROUND(list_sum(emb[1:8]), 4) + 0.0 AS head8_sum
        |FROM e ORDER BY vec_id""".stripMargin,

    "f5_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_bucket,
        | COUNT(*) AS cnt,
        | CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
        |FROM events GROUP BY k_bucket ORDER BY k_bucket""".stripMargin,

    "f6_conditional" ->
      """SELECT c_custkey, c_acctbal,
        | CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS tier,
        | COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(none)') AS seg_or_none,
        | LEAST(c_acctbal, 1000.0) AS bal_min1k,
        | GREATEST(c_acctbal, 0.0) AS bal_nonneg
        |FROM customer ORDER BY c_custkey""".stripMargin,

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

    "f9_bitwise" ->
      """SELECT o_orderkey,
        | o_orderkey & 255 AS low_byte,
        | o_orderkey | 4096 AS with_flag,
        | xor(o_orderkey, o_custkey) AS key_mix,
        | o_orderkey << 3 AS shl3,
        | o_orderkey >> 2 AS shr2,
        | CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f10_map_funcs" ->
      """SELECT p_partkey,
        | CAST(cardinality(m) AS BIGINT) AS n_keys,
        | m['type'][1] AS type_val,
        | array_to_string(map_keys(m), ',') AS keys_csv,
        | CAST(list_contains(map_keys(m), 'brand') AS INTEGER) AS has_brand,
        | array_to_string(map_values(m), '|') AS vals_csv
        |FROM (SELECT p_partkey,
        |  map(['brand','type','size'], [p_brand, p_type, CAST(p_size AS VARCHAR)]) AS m
        | FROM part)
        |ORDER BY p_partkey""".stripMargin,

    "f11_struct_funcs" ->
      """SELECT c_custkey, prof['name'] AS name, prof['addr']['nk'] AS nk,
        | prof['addr']['seg'] AS seg, CAST(prof['pos'] AS INTEGER) AS pos_bal
        |FROM (SELECT c_custkey, struct_pack(name := c_name,
        |   addr := struct_pack(nk := c_nationkey, seg := c_mktsegment),
        |   pos := c_acctbal > 0) AS prof FROM customer)
        |ORDER BY c_custkey""".stripMargin,

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

    "u1_scalar_udf" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(CAST((l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax) AS DECIMAL(18,6)) AS DOUBLE) AS score
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, score""".stripMargin,

    // u2/u8: wavg = exact rational half-up at 4 dp, mirrored as integer
    // math — N = num·10⁸, D = den·10⁴ (both integral: the sums carry
    // scale-8/scale-4 decimals), r = (2N + D) // 2D. Rounding the DOUBLE
    // quotient instead diverges at the .00005 boundaries quantized inputs
    // concentrate on (round-9 u8 lesson).
    "u2_udaf_wavg" ->
      """WITH g AS (SELECT c_mktsegment,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
        |      * CAST(l_discount AS DECIMAL(18,4))) * 100000000 AS HUGEINT) AS n,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) * 10000 AS HUGEINT) AS dd
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        | GROUP BY c_mktsegment)
        |SELECT c_mktsegment,
        | CAST(CAST((2 * n + dd) // (2 * dd) AS BIGINT) AS DOUBLE) / 10000.0
        |  AS wavg_price
        |FROM g ORDER BY c_mktsegment""".stripMargin,

    // u8: WAvg-as-window-function mirror — same decimal quantization as
    // u2, running frame; order ties beyond (price, discount) are identical
    // rows, so the running sequence is tie-order invariant on both engines
    "u8_udaf_window" ->
      """WITH li AS (SELECT l_suppkey, CAST(l_shipdate AS DATE) AS ship_date,
        |  l_orderkey, l_linenumber, l_extendedprice, l_discount
        | FROM lineitem WHERE l_discount > 0),
        | r AS (SELECT l_suppkey, ship_date, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
        |      * CAST(l_discount AS DECIMAL(18,4))) OVER w
        |    * 100000000 AS HUGEINT) AS n,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) OVER w
        |    * 10000 AS HUGEINT) AS dd
        | FROM li
        | WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY ship_date, l_orderkey, l_linenumber, l_extendedprice,
        |    l_discount
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT l_suppkey, ship_date, l_orderkey, l_linenumber,
        | CAST(CAST((2 * n + dd) // (2 * dd) AS BIGINT) AS DOUBLE) / 10000.0
        |  AS run_wavg
        |FROM r
        |ORDER BY l_suppkey, ship_date, l_orderkey, l_linenumber,
        | run_wavg""".stripMargin,

    "u3_generator" ->
      """SELECT o_orderkey, UNNEST(generate_series(1, o_orderkey % 3 + 1)) AS installment
        |FROM orders ORDER BY o_orderkey, installment""".stripMargin,

    // outer-generate semantics: empty arrays pad one all-NULL row; DuckDB's
    // parallel UNNESTs zip (range supplies the 0-based pos like posexplode)
    "u4_posexplode_outer" ->
      """WITH base AS (SELECT p_partkey,
        |  list_slice(string_split(p_name, ' '), 1, CAST(p_partkey % 3 AS INTEGER)) AS arr
        | FROM part)
        |SELECT p_partkey, pos, word FROM (
        | SELECT p_partkey, CAST(UNNEST(range(len(arr))) AS BIGINT) AS pos,
        |  UNNEST(arr) AS word FROM base WHERE len(arr) > 0
        | UNION ALL
        | SELECT p_partkey, NULL, NULL FROM base WHERE len(arr) = 0)
        |ORDER BY p_partkey, pos NULLS FIRST""".stripMargin,

    "l1_dedup_exact" ->
      """SELECT MIN(doc_id) AS survivor_id, md5(lower(trim(text))) AS text_hash,
        | COUNT(*) AS dup_cnt
        |FROM documents GROUP BY text_hash ORDER BY survivor_id""".stripMargin,

    "l2_neardup_jaccard" ->
      """WITH toks AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS t
        |  FROM documents)
        |SELECT a.lang, a.doc_id AS a_id, b.doc_id AS b_id,
        | ROUND(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
        |   / len(list_distinct(a.t || b.t)), 4) AS jaccard
        |FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE 10 * len(list_intersect(a.t, b.t)) >= 9 * len(list_distinct(a.t || b.t))
        |ORDER BY a.lang, a_id, b_id""".stripMargin,

    "l3_cosine_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        | scored AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |   ROUND(list_cosine_similarity(q.emb, c.emb), 4) + 0.0 AS sim
        |  FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
        |SELECT q_id, rnk, c_id, sim FROM (
        | SELECT q_id, c_id, sim,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS INTEGER) AS rnk
        | FROM scored) t
        |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

    "l4_tokenize" ->
      """SELECT token, cnt FROM (
        | SELECT token, COUNT(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) t1
        | GROUP BY token) t2
        |ORDER BY cnt DESC, token LIMIT 20""".stripMargin,

    "l5_text_stats" ->
      """WITH per AS (SELECT lang,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS wc,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS dc,
        |  n_chars FROM documents)
        |SELECT lang, COUNT(*) AS doc_cnt, CAST(SUM(wc) AS BIGINT) AS sum_wc,
        | CAST(SUM(dc) AS BIGINT) AS sum_dc, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        | ROUND(CAST(SUM(dc) AS DOUBLE) / CAST(SUM(wc) AS DOUBLE), 4) AS ttr,
        | ROUND(CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(wc) AS DOUBLE), 4) AS chars_per_word
        |FROM per GROUP BY lang ORDER BY lang""".stripMargin,

    "l6_bm25" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | tf AS (SELECT doc_id, CAST(len(w) AS INTEGER) AS dl,
        |  CAST(len(list_filter(w, x -> x = 'dup')) AS INTEGER) AS tf_dup,
        |  CAST(len(list_filter(w, x -> x = 'vector')) AS INTEGER) AS tf_vector,
        |  CAST(len(list_filter(w, x -> x = 'spark')) AS INTEGER) AS tf_spark
        |  FROM d),
        | st AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
        |  CAST(SUM(CASE WHEN tf_dup > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_dup,
        |  CAST(SUM(CASE WHEN tf_vector > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_vector,
        |  CAST(SUM(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_spark
        |  FROM tf),
        | sc AS (SELECT doc_id, dl, tf_dup, tf_vector, tf_spark,
        |  CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl,
        |  n_docs, df_dup, df_vector, df_spark
        |  FROM tf, st)
        |SELECT doc_id, dl, tf_dup, tf_vector, tf_spark,
        | ROUND(
        |  ln((n_docs - df_dup + 0.5) / (df_dup + 0.5) + 1.0) * (tf_dup * 2.2) / (tf_dup + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
        |  + ln((n_docs - df_vector + 0.5) / (df_vector + 0.5) + 1.0) * (tf_vector * 2.2) / (tf_vector + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
        |  + ln((n_docs - df_spark + 0.5) / (df_spark + 0.5) + 1.0) * (tf_spark * 2.2) / (tf_spark + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
        | , 4) + 0.0 AS score
        |FROM sc ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    "x11_ann_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        | cent AS (SELECT vec_id AS cent_id, emb AS cent_emb FROM e WHERE vec_id < 16),
        | sims AS (SELECT vec_id, cent_id,
        |   ROUND(list_cosine_similarity(emb, cent_emb), 4) + 0.0 AS csim
        |  FROM e, cent),
        | ranked AS (SELECT vec_id, cent_id, csim,
        |   row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS crn
        |  FROM sims),
        | asgn AS (SELECT vec_id AS c_id, cent_id AS cell FROM ranked WHERE crn = 1),
        | probes AS (SELECT vec_id AS q_id, cent_id AS cell FROM ranked
        |  WHERE vec_id < 10 AND crn <= 2),
        | scored AS (SELECT p.q_id, a.c_id,
        |   ROUND(list_cosine_similarity(eq.emb, ec.emb), 4) + 0.0 AS sim
        |  FROM probes p JOIN asgn a ON p.cell = a.cell AND p.q_id <> a.c_id
        |   JOIN e eq ON p.q_id = eq.vec_id JOIN e ec ON a.c_id = ec.vec_id)
        |SELECT q_id, rnk, c_id, sim FROM (
        | SELECT q_id, c_id, sim,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS INTEGER) AS rnk
        | FROM scored) t
        |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin,

    "x13_lm_score" -> (x13Ctes +
      """
        |SELECT doc_id, n_bigrams, avg_logp FROM scored ORDER BY doc_id""".stripMargin),

    // x33: x13's CTE chain verbatim (shared `x13Ctes` — the paired oracles
    // cannot drift) + fixed-threshold CCNet-style bucketing and rollup
    "x33_ppl_bucket" -> (x13Ctes +
      """,
        | docs AS (SELECT doc_id, lang,
        |   CAST(len(string_split(text, ' ')) AS BIGINT) AS wc FROM documents),
        | bucketed AS (SELECT
        |   CASE WHEN s.avg_logp >= -3.37 THEN 'head'
        |        WHEN s.avg_logp >= -3.40 THEN 'middle'
        |        ELSE 'tail' END AS bucket,
        |   d.lang, d.wc, s.avg_logp
        |  FROM scored s JOIN docs d USING (doc_id))
        |SELECT bucket, lang, COUNT(*) AS docs,
        | CAST(SUM(wc) AS BIGINT) AS tokens,
        | ROUND(CAST(SUM(CAST(avg_logp AS DECIMAL(9,4))) AS DOUBLE)
        |   / CAST(COUNT(*) AS DOUBLE), 4) + 0.0 AS mean_logp
        |FROM bucketed GROUP BY bucket, lang ORDER BY bucket, lang""".stripMargin),


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

    "s6_retention" ->
      """WITH e AS (SELECT user_id,
        |  epoch_us(ts) // (86400 * 1000000::BIGINT) AS day_idx FROM events),
        | c AS (SELECT user_id, day_idx,
        |  MIN(day_idx) OVER (PARTITION BY user_id) AS cohort_idx FROM e)
        |SELECT CAST(to_timestamp(cohort_idx * 86400) AS DATE) AS cohort_day,
        | day_idx - cohort_idx AS day_offset,
        | COUNT(DISTINCT user_id) AS active_users, COUNT(*) AS event_cnt
        |FROM c GROUP BY cohort_idx, day_offset ORDER BY cohort_day, day_offset""".stripMargin,

    "r6_degree_dist" ->
      """WITH fk AS (
        |  SELECT 'nationkey' AS p, CAST(c_nationkey AS VARCHAR) AS o FROM customer
        |  UNION ALL
        |  SELECT 'regionkey' AS p, CAST(n_regionkey AS VARCHAR) AS o FROM nation),
        | deg AS (SELECT p, o, COUNT(*) AS degree FROM fk GROUP BY p, o)
        |SELECT p, degree, COUNT(*) AS n_objects
        |FROM deg GROUP BY p, degree ORDER BY p, degree""".stripMargin,

    // mirrors Rdf.r7: scaled-integer PageRank, 3 unrolled iterations over
    // the FK link graph; all steps integer (floor division, bigint sums)
    "r7_pagerank" ->
      """WITH edges AS (
        |  SELECT 'l:'||l_orderkey||':'||l_linenumber AS src, 'o:'||l_orderkey AS dst FROM lineitem
        |  UNION ALL SELECT 'l:'||l_orderkey||':'||l_linenumber, 'p:'||l_partkey FROM lineitem
        |  UNION ALL SELECT 'l:'||l_orderkey||':'||l_linenumber, 's:'||l_suppkey FROM lineitem
        |  UNION ALL SELECT 'o:'||o_orderkey, 'c:'||o_custkey FROM orders
        |  UNION ALL SELECT 'c:'||c_custkey, 'n:'||c_nationkey FROM customer
        |  UNION ALL SELECT 's:'||s_suppkey, 'n:'||s_nationkey FROM supplier
        |  UNION ALL SELECT 'n:'||n_nationkey, 'r:'||n_regionkey FROM nation),
        | nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        | deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
        | ed AS (SELECT e.src, e.dst, dg.d FROM edges e JOIN deg dg ON e.src = dg.src),
        | r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS pr FROM nodes),
        | s1 AS (SELECT ed.dst, SUM(r0.pr // ed.d) AS sm
        |  FROM ed JOIN r0 ON ed.src = r0.node GROUP BY ed.dst),
        | r1 AS (SELECT n.node, CAST(150000000000 + COALESCE(s1.sm, 0) * 17 // 20 AS BIGINT) AS pr
        |  FROM nodes n LEFT JOIN s1 ON n.node = s1.dst),
        | s2 AS (SELECT ed.dst, SUM(r1.pr // ed.d) AS sm
        |  FROM ed JOIN r1 ON ed.src = r1.node GROUP BY ed.dst),
        | r2 AS (SELECT n.node, CAST(150000000000 + COALESCE(s2.sm, 0) * 17 // 20 AS BIGINT) AS pr
        |  FROM nodes n LEFT JOIN s2 ON n.node = s2.dst),
        | s3 AS (SELECT ed.dst, SUM(r2.pr // ed.d) AS sm
        |  FROM ed JOIN r2 ON ed.src = r2.node GROUP BY ed.dst),
        | r3 AS (SELECT n.node, CAST(150000000000 + COALESCE(s3.sm, 0) * 17 // 20 AS BIGINT) AS pr
        |  FROM nodes n LEFT JOIN s3 ON n.node = s3.dst)
        |SELECT node, pr AS "rank" FROM r3 ORDER BY pr DESC, node LIMIT 25""".stripMargin,

    // r8: r7's chain + per-round dangling-mass share (scalar subquery d_i)
    // folded into the damping constant — the standard redistributed form
    "r8_pagerank_redist" ->
      """WITH edges AS (
        |  SELECT 'l:'||l_orderkey||':'||l_linenumber AS src, 'o:'||l_orderkey AS dst FROM lineitem
        |  UNION ALL SELECT 'l:'||l_orderkey||':'||l_linenumber, 'p:'||l_partkey FROM lineitem
        |  UNION ALL SELECT 'l:'||l_orderkey||':'||l_linenumber, 's:'||l_suppkey FROM lineitem
        |  UNION ALL SELECT 'o:'||o_orderkey, 'c:'||o_custkey FROM orders
        |  UNION ALL SELECT 'c:'||c_custkey, 'n:'||c_nationkey FROM customer
        |  UNION ALL SELECT 's:'||s_suppkey, 'n:'||s_nationkey FROM supplier
        |  UNION ALL SELECT 'n:'||n_nationkey, 'r:'||n_regionkey FROM nation),
        | nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        | deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
        | ed AS (SELECT e.src, e.dst, dg.d FROM edges e JOIN deg dg ON e.src = dg.src),
        | dangl AS (SELECT node FROM nodes EXCEPT SELECT DISTINCT src FROM edges),
        | nn AS (SELECT COUNT(*) AS n FROM nodes),
        | r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS pr FROM nodes),
        | d0 AS (SELECT CAST(COALESCE(SUM(r0.pr), 0) // MAX(nn.n) AS BIGINT) AS sh
        |  FROM r0 JOIN dangl USING (node), nn),
        | s1 AS (SELECT ed.dst, SUM(r0.pr // ed.d) AS sm
        |  FROM ed JOIN r0 ON ed.src = r0.node GROUP BY ed.dst),
        | r1 AS (SELECT n.node, CAST(150000000000 + (COALESCE(s1.sm, 0) + (SELECT sh FROM d0)) * 17 // 20 AS BIGINT) AS pr
        |  FROM nodes n LEFT JOIN s1 ON n.node = s1.dst),
        | d1 AS (SELECT CAST(COALESCE(SUM(r1.pr), 0) // MAX(nn.n) AS BIGINT) AS sh
        |  FROM r1 JOIN dangl USING (node), nn),
        | s2 AS (SELECT ed.dst, SUM(r1.pr // ed.d) AS sm
        |  FROM ed JOIN r1 ON ed.src = r1.node GROUP BY ed.dst),
        | r2 AS (SELECT n.node, CAST(150000000000 + (COALESCE(s2.sm, 0) + (SELECT sh FROM d1)) * 17 // 20 AS BIGINT) AS pr
        |  FROM nodes n LEFT JOIN s2 ON n.node = s2.dst),
        | d2 AS (SELECT CAST(COALESCE(SUM(r2.pr), 0) // MAX(nn.n) AS BIGINT) AS sh
        |  FROM r2 JOIN dangl USING (node), nn),
        | s3 AS (SELECT ed.dst, SUM(r2.pr // ed.d) AS sm
        |  FROM ed JOIN r2 ON ed.src = r2.node GROUP BY ed.dst),
        | r3 AS (SELECT n.node, CAST(150000000000 + (COALESCE(s3.sm, 0) + (SELECT sh FROM d2)) * 17 // 20 AS BIGINT) AS pr
        |  FROM nodes n LEFT JOIN s3 ON n.node = s3.dst)
        |SELECT node, pr AS "rank" FROM r3 ORDER BY pr DESC, node LIMIT 25""".stripMargin,

    "l7_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        | tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        | df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        | n AS (SELECT COUNT(*) AS n FROM documents),
        | sc AS (SELECT doc_id, tf.term, tf,
        |   CAST(tf AS DECIMAL(10,0))
        |    * CAST(ROUND(ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE)), 9) AS DECIMAL(18,9)) AS score
        |  FROM tf JOIN df ON tf.term = df.term, n)
        |SELECT doc_id, term, tf, CAST(score AS DOUBLE) AS score
        |FROM sc ORDER BY score DESC, doc_id, term LIMIT 100""".stripMargin,

    "x14_contamination" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e','f') THEN 'test'
        |       ELSE 'train' END AS split
        | FROM documents),
        | tri AS (SELECT doc_id, split,
        |   unnest(list_transform(range(1, len(w) - 1),
        |     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |  FROM d),
        | trainsh AS (SELECT DISTINCT sh FROM tri WHERE split = 'train'),
        | testsh AS (SELECT DISTINCT doc_id, sh FROM tri WHERE split = 'test')
        |SELECT t.doc_id, COUNT(*) AS n_shingles, COUNT(tr.sh) AS n_contaminated,
        | ROUND(CAST(COUNT(tr.sh) AS DOUBLE) / COUNT(*), 4) + 0.0 AS contamination_rate
        |FROM testsh t LEFT JOIN trainsh tr ON t.sh = tr.sh
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    "x15_source_diversity" ->
      """WITH tok AS (SELECT source, doc_id, unnest(string_split(text, ' ')) AS tok
        | FROM documents)
        |SELECT source, COUNT(DISTINCT doc_id) AS doc_cnt, COUNT(*) AS total_tokens,
        | COUNT(DISTINCT tok) AS distinct_tokens,
        | ROUND(CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*), 4) + 0.0 AS type_token_ratio
        |FROM tok GROUP BY source ORDER BY source""".stripMargin,

    "x16_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | tr AS (SELECT doc_id,
        |   list_transform(range(1, len(w) - 1),
        |     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS tri
        |  FROM d WHERE len(w) >= 3)
        |SELECT doc_id, len(tri) AS n_trigrams, len(list_distinct(tri)) AS n_distinct,
        | ROUND(1.0 - CAST(len(list_distinct(tri)) AS DOUBLE) / len(tri), 4) + 0.0 AS rep_ratio
        |FROM tr ORDER BY doc_id""".stripMargin,

    // composite gate: x6's quality formula + x16's repetition formula,
    // thresholds compared on the ROUNDED values (D4) on both engines
    "x18_quality_gate" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | c AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS wc,
        |  len(list_filter(w, t -> list_contains(['the','a','of','and'], t))) AS stop_cnt,
        |  len(list_filter(w, t -> length(t) <= 2)) AS short_cnt
        |  FROM w),
        | q AS (SELECT doc_id, wc,
        |  ROUND(1.0 - 0.5 * (CAST(stop_cnt AS DOUBLE) / wc)
        |    - 0.3 * (CAST(short_cnt AS DOUBLE) / wc), 4) + 0.0 AS quality,
        |  CASE WHEN len(w) >= 3 THEN
        |   ROUND(1.0 - CAST(len(list_distinct(list_transform(range(1, len(w) - 1),
        |     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS DOUBLE)
        |    / (len(w) - 2), 4) + 0.0
        |  ELSE 0.0 END AS rep_ratio
        | FROM c),
        | r AS (SELECT doc_id, wc, quality, rep_ratio,
        |  CASE WHEN wc BETWEEN 5 AND 5000 THEN 1 ELSE 0 END AS r_len,
        |  CASE WHEN quality >= 0.5 THEN 1 ELSE 0 END AS r_quality,
        |  CASE WHEN rep_ratio <= 0.2 THEN 1 ELSE 0 END AS r_rep
        | FROM q)
        |SELECT doc_id, wc, quality, rep_ratio, r_len, r_quality, r_rep,
        | r_len * r_quality * r_rep AS keep
        |FROM r ORDER BY doc_id""".stripMargin,

    // mixing rule: fixed-width lowercase hex compares lexicographically =
    // numerically; 'zz' sorts above every hex pair = keep-all
    "x19_weighted_sample" ->
      """WITH t AS (SELECT source,
        |  len(string_split(text, ' ')) AS wc,
        |  CAST(regexp_extract(source, '([0-9]+)$', 1) AS INTEGER) AS sn,
        |  substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h
        | FROM documents),
        | k AS (SELECT source, wc,
        |  CASE WHEN h < (CASE WHEN sn < 5 THEN 'zz' WHEN sn < 10 THEN '80'
        |                 ELSE '40' END)
        |   THEN 1 ELSE 0 END AS kept
        | FROM t)
        |SELECT source, COUNT(*) AS docs_total,
        | CAST(SUM(kept) AS BIGINT) AS docs_kept,
        | CAST(SUM(CASE WHEN kept = 1 THEN wc ELSE 0 END) AS BIGINT) AS tokens_kept
        |FROM k GROUP BY source ORDER BY source""".stripMargin,

    "x12_split_sample" ->
      """WITH t AS (SELECT lang, n_chars,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e','f') THEN 'test'
        |       ELSE 'train' END AS split
        | FROM documents)
        |SELECT lang, split, COUNT(*) AS doc_cnt, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM t GROUP BY lang, split ORDER BY lang, split""".stripMargin,

    "x1_minhash_lsh" -> (x1Ctes +
      """
        |SELECT c.lang, c.a_id, c.b_id,
        | ROUND(CAST(len(list_intersect(ta.t, tb.t)) AS DOUBLE)
        |   / len(list_distinct(ta.t || tb.t)), 4) AS jaccard
        |FROM cand c JOIN toks ta ON c.a_id = ta.doc_id JOIN toks tb ON c.b_id = tb.doc_id
        |WHERE 10 * len(list_intersect(ta.t, tb.t)) >= 7 * len(list_distinct(ta.t || tb.t))
        |ORDER BY c.lang, a_id, b_id""".stripMargin),

    // x44: mh_est = slot-agreement k/8 — every value an exact dyadic
    // (0.125 grid), so no ROUND anywhere on that column
    "x44_minhash_accuracy" -> (x1Ctes +
      """
        |SELECT c.lang, c.a_id, c.b_id,
        | ROUND(CAST(len(list_intersect(ta.t, tb.t)) AS DOUBLE)
        |   / len(list_distinct(ta.t || tb.t)), 4) AS jaccard,
        | CAST((CASE WHEN sa.mh0 = sb.mh0 THEN 1 ELSE 0 END
        |   + CASE WHEN sa.mh1 = sb.mh1 THEN 1 ELSE 0 END
        |   + CASE WHEN sa.mh2 = sb.mh2 THEN 1 ELSE 0 END
        |   + CASE WHEN sa.mh3 = sb.mh3 THEN 1 ELSE 0 END
        |   + CASE WHEN sa.mh4 = sb.mh4 THEN 1 ELSE 0 END
        |   + CASE WHEN sa.mh5 = sb.mh5 THEN 1 ELSE 0 END
        |   + CASE WHEN sa.mh6 = sb.mh6 THEN 1 ELSE 0 END
        |   + CASE WHEN sa.mh7 = sb.mh7 THEN 1 ELSE 0 END) AS DOUBLE) / 8.0
        |  AS mh_est
        |FROM cand c
        | JOIN toks ta ON c.a_id = ta.doc_id JOIN toks tb ON c.b_id = tb.doc_id
        | JOIN sig sa ON c.a_id = sa.doc_id JOIN sig sb ON c.b_id = sb.doc_id
        |ORDER BY c.lang, a_id, b_id""".stripMargin),

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

    "x17_cross_source" -> (x1Ctes +
      """,
        | pairs AS (SELECT c.a_id, c.b_id
        |  FROM cand c JOIN toks ta ON c.a_id = ta.doc_id JOIN toks tb ON c.b_id = tb.doc_id
        |  WHERE 10 * len(list_intersect(ta.t, tb.t)) >= 7 * len(list_distinct(ta.t || tb.t)))
        |SELECT least(sa.source, sb.source) AS src1, greatest(sa.source, sb.source) AS src2,
        | COUNT(*) AS pair_cnt
        |FROM pairs p JOIN documents sa ON p.a_id = sa.doc_id
        | JOIN documents sb ON p.b_id = sb.doc_id
        |GROUP BY src1, src2
        |ORDER BY src1, src2""".stripMargin),

    "x2_simhash" ->
      """WITH tok AS (SELECT doc_id, lang, unnest(list_distinct(string_split(text, ' '))) AS t
        |  FROM documents),
        | bits AS (SELECT doc_id, lang, pos, md5(t) AS h
        |  FROM tok, (SELECT unnest(range(16)) AS pos) p),
        | contrib AS (SELECT doc_id, lang, pos,
        |   2 * ((strpos('0123456789abcdef', substr(h, CAST(pos + 1 AS INTEGER), 1)) - 1) % 2) - 1 AS c
        |  FROM bits),
        | sc AS (SELECT doc_id, lang, pos, SUM(c) AS sc FROM contrib GROUP BY 1, 2, 3),
        | b AS (SELECT doc_id, lang, pos, CASE WHEN sc > 0 THEN 1 ELSE 0 END AS bit FROM sc)
        |SELECT doc_id, lang, CAST(SUM(bit * CAST(pow(2, pos) AS BIGINT)) AS BIGINT) AS simhash
        |FROM b GROUP BY doc_id, lang ORDER BY doc_id""".stripMargin,

    "x3_ngram_jaccard" ->
      """WITH ex AS (SELECT doc_id, lang,
        |  unnest(list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |   i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
        |        || ' ' || string_split(text, ' ')[i+2]))) AS tok
        | FROM documents),
        | kept AS (SELECT lang, tok FROM (SELECT lang, tok, COUNT(*) AS df
        |   FROM ex GROUP BY lang, tok) x WHERE df <= 1000),
        | tg AS (SELECT doc_id, ex.lang, list(ex.tok) AS t
        |  FROM ex JOIN kept ON ex.lang = kept.lang AND ex.tok = kept.tok
        |  GROUP BY doc_id, ex.lang)
        |SELECT a.lang, a.doc_id AS a_id, b.doc_id AS b_id,
        | ROUND(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
        |   / len(list_distinct(a.t || b.t)), 4) AS jaccard
        |FROM tg a JOIN tg b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE 5 * len(list_intersect(a.t, b.t)) >= len(list_distinct(a.t || b.t))
        |  AND len(list_distinct(a.t || b.t)) > 0
        |ORDER BY a.lang, a_id, b_id""".stripMargin,

    "x23_containment" ->
      """WITH ex AS (SELECT doc_id, lang,
        |  unnest(list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |   i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
        |        || ' ' || string_split(text, ' ')[i+2]))) AS tok
        | FROM documents),
        | kept AS (SELECT lang, tok FROM (SELECT lang, tok, COUNT(*) AS df
        |   FROM ex GROUP BY lang, tok) x WHERE df <= 1000),
        | tg AS (SELECT doc_id, ex.lang, list(ex.tok) AS t
        |  FROM ex JOIN kept ON ex.lang = kept.lang AND ex.tok = kept.tok
        |  GROUP BY doc_id, ex.lang),
        | pr AS (SELECT a.lang, a.doc_id AS a_id, b.doc_id AS b_id,
        |   len(list_intersect(a.t, b.t)) AS i, len(a.t) AS a_sz, len(b.t) AS b_sz
        |  FROM tg a JOIN tg b ON a.lang = b.lang AND a.doc_id < b.doc_id),
        | dir AS (
        |  SELECT lang, a_id AS contained_id, b_id AS container_id,
        |   ROUND(CAST(i AS DOUBLE) / a_sz, 4) + 0.0 AS containment
        |  FROM pr WHERE i * 10 >= a_sz * 8
        |  UNION ALL
        |  SELECT lang, b_id, a_id, ROUND(CAST(i AS DOUBLE) / b_sz, 4) + 0.0
        |  FROM pr WHERE i * 10 >= b_sz * 8)
        |SELECT lang, contained_id, container_id, containment
        |FROM dir ORDER BY lang, contained_id, container_id""".stripMargin,

    // mirrors Pipeline.x24: md5-keyed 5-gram occurrences; a gram is
    // cross-doc iff MIN(doc_id) < MAX(doc_id); coverage = distinct token
    // positions under any cross-doc gram / token count (1-based positions
    // here vs 0-based in Spark — only the COUNT of positions is compared)
    // x34: windowed argmin = ONE string MIN over h || lpad(inverted pos);
    // DuckDB's 1-based pos gives the same inverted string as Spark's
    // 0-based (100000000 - (p+1) = 99999999 - p)
    "x34_winnow" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | base AS (SELECT doc_id,
        |   CAST(GREATEST(len(w) - 4, 0) AS BIGINT) AS n_grams,
        |   CAST(GREATEST(len(w) - 7, 0) AS BIGINT) AS n_windows FROM d),
        | st AS (SELECT doc_id, unnest(range(1, len(w) - 3)) AS pos, w
        |  FROM d WHERE len(w) >= 5),
        | occ AS (SELECT doc_id, pos,
        |   md5(w[pos] || ' ' || w[pos+1] || ' ' || w[pos+2] || ' '
        |       || w[pos+3] || ' ' || w[pos+4]) AS h
        |  FROM st),
        | selw AS (SELECT doc_id, pos,
        |   MIN(h || lpad(CAST(100000000 - pos AS VARCHAR), 8, '0'))
        |     OVER (PARTITION BY doc_id ORDER BY pos
        |           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sel
        |  FROM occ),
        | fps AS (SELECT DISTINCT doc_id, substr(sel, 1, 32) AS fh
        |  FROM selw WHERE pos >= 4),
        | shared AS (SELECT fh FROM fps GROUP BY fh
        |  HAVING MIN(doc_id) < MAX(doc_id)),
        | perdoc AS (SELECT doc_id, COUNT(*) AS n_fp FROM fps GROUP BY doc_id),
        | shdoc AS (SELECT doc_id, COUNT(*) AS shared_fp
        |  FROM fps JOIN shared USING (fh) GROUP BY doc_id)
        |SELECT b.doc_id, b.n_grams, COALESCE(p.n_fp, 0) AS n_fp,
        | COALESCE(sd.shared_fp, 0) AS shared_fp,
        | CASE WHEN b.n_windows > 0 THEN
        |   ROUND(CAST(COALESCE(p.n_fp, 0) AS DOUBLE) / b.n_windows, 4) + 0.0
        |  ELSE 0.0 END AS density
        |FROM base b LEFT JOIN perdoc p USING (doc_id)
        | LEFT JOIN shdoc sd USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,

    "x24_repeated_spans" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | base AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM d),
        | st AS (SELECT doc_id, unnest(range(1, len(w) - 3)) AS pos, w
        |  FROM d WHERE len(w) >= 5),
        | occ AS (SELECT doc_id, pos,
        |   md5(w[pos] || ' ' || w[pos+1] || ' ' || w[pos+2] || ' '
        |       || w[pos+3] || ' ' || w[pos+4]) AS gh
        |  FROM st),
        | dup AS (SELECT gh FROM occ GROUP BY gh
        |  HAVING MIN(doc_id) < MAX(doc_id)),
        | cove AS (SELECT doc_id, pos, unnest([0, 1, 2, 3, 4]) AS k
        |  FROM occ JOIN dup USING (gh)),
        | agg AS (SELECT doc_id, COUNT(DISTINCT pos + k) AS n_covered
        |  FROM cove GROUP BY doc_id)
        |SELECT b.doc_id, b.n_tokens, COALESCE(a.n_covered, 0) AS n_covered,
        | ROUND(CAST(COALESCE(a.n_covered, 0) AS DOUBLE) / b.n_tokens, 4) + 0.0
        |  AS coverage
        |FROM base b LEFT JOIN agg a USING (doc_id) ORDER BY b.doc_id""".stripMargin,

    "x4_embed_neardup" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        | eb AS (SELECT vec_id, label, k AS band,
        |   CAST(list_sum(list_transform(range(4),
        |     j -> CASE WHEN emb[4*k + j + 1] > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END)) AS BIGINT) AS bval
        |  FROM e, (SELECT unnest(range(16)) AS k) ks),
        | cand AS (SELECT DISTINCT a.label, a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM eb a JOIN eb b ON a.label = b.label AND a.band = b.band
        |   AND a.bval = b.bval AND a.vec_id < b.vec_id)
        |SELECT c.label, c.a_id, c.b_id,
        | ROUND(list_cosine_similarity(ea.emb, eb2.emb), 4) + 0.0 AS sim
        |FROM cand c JOIN e ea ON c.a_id = ea.vec_id JOIN e eb2 ON c.b_id = eb2.vec_id
        |WHERE ROUND(list_cosine_similarity(ea.emb, eb2.emb), 4) >= 0.4
        |ORDER BY c.label, a_id, b_id""".stripMargin,

    "x5_langid" ->
      """WITH t AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks FROM documents),
        | sc AS (SELECT doc_id, lang,
        |  len(list_intersect(toks, ['the','a','fast','slow','big','small'])) AS s_en,
        |  len(list_intersect(toks, ['der','die','das','und','schnell'])) AS s_de,
        |  len(list_intersect(toks, ['el','la','los','rapido','lento'])) AS s_es,
        |  len(list_intersect(toks, ['le','les','vite','grand','petit'])) AS s_fr,
        |  len(list_intersect(toks, ['de','shi','kuai','man','da'])) AS s_zh
        |  FROM t),
        | pred AS (SELECT doc_id, lang,
        |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |       WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |       WHEN s_es >= s_en AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |       WHEN s_fr >= s_en AND s_fr >= s_de AND s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
        |       ELSE 'zh' END AS pred_lang
        |  FROM sc)
        |SELECT doc_id, lang AS actual_lang, pred_lang,
        | CASE WHEN pred_lang = lang THEN 1 ELSE 0 END AS correct
        |FROM pred ORDER BY doc_id""".stripMargin,

    "x6_quality_score" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | c AS (SELECT doc_id, CAST(len(w) AS INTEGER) AS wc,
        |  CAST(len(list_filter(w, t -> list_contains(['the','a','of','and'], t))) AS INTEGER) AS stop_cnt,
        |  CAST(len(list_filter(w, t -> length(t) <= 2)) AS INTEGER) AS short_cnt
        |  FROM w)
        |SELECT doc_id, wc, stop_cnt, short_cnt,
        | ROUND(1.0 - 0.5 * (CAST(stop_cnt AS DOUBLE) / wc)
        |   - 0.3 * (CAST(short_cnt AS DOUBLE) / wc), 4) + 0.0 AS quality
        |FROM c ORDER BY doc_id""".stripMargin,

    "x7_token_count" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
        | CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS alpha_tokens,
        | CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS INTEGER) AS bpe_pieces,
        | CAST(length(text) AS INTEGER) AS text_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x8_fingerprint" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |SELECT doc_id,
        | md5(array_to_string(list_sort(list_distinct(w)), ' ')) AS content_fp,
        | list_aggregate(list_transform(range(1, len(w) - 1),
        |   i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2])), 'min') AS min_shingle_fp
        |FROM w ORDER BY doc_id""".stripMargin,

    "x10_simhash_pairs" ->
      """WITH tok AS (SELECT doc_id, lang, unnest(list_distinct(string_split(text, ' '))) AS t
        |  FROM documents),
        | bits AS (SELECT doc_id, lang, pos, md5(t) AS h
        |  FROM tok, (SELECT unnest(range(16)) AS pos) p),
        | contrib AS (SELECT doc_id, lang, pos,
        |   2 * ((strpos('0123456789abcdef', substr(h, CAST(pos + 1 AS INTEGER), 1)) - 1) % 2) - 1 AS c
        |  FROM bits),
        | sc AS (SELECT doc_id, lang, pos, SUM(c) AS sc FROM contrib GROUP BY 1, 2, 3),
        | bt AS (SELECT doc_id, lang, pos, CASE WHEN sc > 0 THEN 1 ELSE 0 END AS bv FROM sc),
        | sh AS (SELECT doc_id, lang, CAST(SUM(bv * CAST(pow(2, pos) AS BIGINT)) AS BIGINT) AS s
        |  FROM bt GROUP BY doc_id, lang)
        |SELECT a.lang, a.doc_id AS a_id, b.doc_id AS b_id,
        | CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
        |FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.s, b.s)) <= 1
        |ORDER BY a.lang, a_id, b_id""".stripMargin,

    "a16_listagg" ->
      """SELECT r_name, COUNT(*) AS n_nations,
        | string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "s7_rolling_active" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |  epoch_us(ts) // (86400 * 1000000::BIGINT) AS day_idx FROM events),
        | dau AS (SELECT day_idx, COUNT(*) AS dau FROM ud GROUP BY day_idx),
        | cover AS (SELECT DISTINCT day_idx + k AS cover_idx, user_id
        |  FROM ud, (SELECT unnest(range(7)) AS k) ks),
        | wau AS (SELECT cover_idx, COUNT(*) AS wau FROM cover GROUP BY cover_idx)
        |SELECT CAST(to_timestamp(day_idx * 86400) AS DATE) AS day, dau, wau
        |FROM dau JOIN wau ON day_idx = cover_idx ORDER BY day""".stripMargin,

    "l8_pmi_colloc" ->
      """WITH sp AS (SELECT string_split(text, ' ') AS w FROM documents),
        | bi AS (SELECT unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
        |   unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2 FROM sp),
        | n AS (SELECT COUNT(*) AS n_total FROM bi),
        | c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2),
        | c1 AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY 1),
        | c2 AS (SELECT w2, COUNT(*) AS c2 FROM bi GROUP BY 1)
        |SELECT w1, w2, c12,
        | ROUND(ln(CAST(c12 * n_total AS DOUBLE) / CAST(c1 * c2 AS DOUBLE)), 4) + 0.0 AS pmi
        |FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2), n
        |WHERE c12 >= 5
        |ORDER BY CAST(c12 * n_total AS DOUBLE) / CAST(c1 * c2 AS DOUBLE) DESC, w1, w2
        |LIMIT 50""".stripMargin,

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

    "x20_dup_clusters" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, lang, unnest(list_distinct(string_split(text, ' '))) AS t
        |  FROM documents),
        | bits AS (SELECT doc_id, lang, pos, md5(t) AS h
        |  FROM tok, (SELECT unnest(range(16)) AS pos) p),
        | contrib AS (SELECT doc_id, lang, pos,
        |   2 * ((strpos('0123456789abcdef', substr(h, CAST(pos + 1 AS INTEGER), 1)) - 1) % 2) - 1 AS c
        |  FROM bits),
        | sc AS (SELECT doc_id, lang, pos, SUM(c) AS sc FROM contrib GROUP BY 1, 2, 3),
        | bt AS (SELECT doc_id, lang, pos, CASE WHEN sc > 0 THEN 1 ELSE 0 END AS bv FROM sc),
        | sh AS (SELECT doc_id, lang, CAST(SUM(bv * CAST(pow(2, pos) AS BIGINT)) AS BIGINT) AS s
        |  FROM bt GROUP BY doc_id, lang),
        | pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.s, b.s)) <= 1),
        | edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
        |  UNION ALL SELECT b_id, a_id FROM pairs),
        | reach(root, node) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT r.root, e.dst FROM reach r JOIN edges e ON r.node = e.src)
        |SELECT root AS doc_id, MIN(node) AS cluster,
        | CASE WHEN MIN(node) <> root THEN 1 ELSE 0 END AS is_dup
        |FROM reach GROUP BY root ORDER BY doc_id""".stripMargin,

    // mirrors Pipeline.x25: x20's true-CC cluster chain + x6's quality
    // score, then one window picking the per-cluster canonical survivor
    // (max quality, ties to min doc_id)
    "x25_dedup_keep_list" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, lang, unnest(list_distinct(string_split(text, ' '))) AS t
        |  FROM documents),
        | bits AS (SELECT doc_id, lang, pos, md5(t) AS h
        |  FROM tok, (SELECT unnest(range(16)) AS pos) p),
        | contrib AS (SELECT doc_id, lang, pos,
        |   2 * ((strpos('0123456789abcdef', substr(h, CAST(pos + 1 AS INTEGER), 1)) - 1) % 2) - 1 AS c
        |  FROM bits),
        | sc AS (SELECT doc_id, lang, pos, SUM(c) AS sc FROM contrib GROUP BY 1, 2, 3),
        | bt AS (SELECT doc_id, lang, pos, CASE WHEN sc > 0 THEN 1 ELSE 0 END AS bv FROM sc),
        | sh AS (SELECT doc_id, lang, CAST(SUM(bv * CAST(pow(2, pos) AS BIGINT)) AS BIGINT) AS s
        |  FROM bt GROUP BY doc_id, lang),
        | pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.s, b.s)) <= 1),
        | edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
        |  UNION ALL SELECT b_id, a_id FROM pairs),
        | reach(root, node) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT r.root, e.dst FROM reach r JOIN edges e ON r.node = e.src),
        | cl AS (SELECT root AS doc_id, MIN(node) AS cluster
        |  FROM reach GROUP BY root),
        | w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | cq AS (SELECT doc_id, CAST(len(w) AS INTEGER) AS wc,
        |  CAST(len(list_filter(w, t -> list_contains(['the','a','of','and'], t))) AS INTEGER) AS stop_cnt,
        |  CAST(len(list_filter(w, t -> length(t) <= 2)) AS INTEGER) AS short_cnt
        |  FROM w),
        | q AS (SELECT doc_id,
        |  ROUND(1.0 - 0.5 * (CAST(stop_cnt AS DOUBLE) / wc)
        |    - 0.3 * (CAST(short_cnt AS DOUBLE) / wc), 4) + 0.0 AS quality
        |  FROM cq),
        | r AS (SELECT cl.doc_id, cl.cluster, q.quality,
        |   ROW_NUMBER() OVER (PARTITION BY cl.cluster
        |     ORDER BY q.quality DESC, cl.doc_id ASC) AS rn
        |  FROM cl JOIN q USING (doc_id))
        |SELECT doc_id, cluster, quality,
        | CASE WHEN rn = 1 THEN 1 ELSE 0 END AS keep
        |FROM r ORDER BY doc_id""".stripMargin,

    // mirrors Pipeline.x26: top-50 Zipf head with cumulative corpus share
    "x26_vocab_coverage" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        | cnt AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
        | tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM cnt),
        | top AS (SELECT token, cnt FROM cnt ORDER BY cnt DESC, token LIMIT 50)
        |SELECT token,
        | CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS INTEGER) AS rnk,
        | cnt,
        | ROUND(CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        |   / CAST(total AS DOUBLE), 4) + 0.0 AS cum_share
        |FROM top, tot ORDER BY rnk""".stripMargin,

    // mirrors Pipeline.x27: curriculum order (x6 quality desc, doc_id) cut
    // into fixed-token shards; the oracle states the SINGLE global running
    // sum the Spark side computes as a distributed two-phase prefix sum
    "x27_shard_pack" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | c AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS wc,
        |  CAST(len(list_filter(w, t -> list_contains(['the','a','of','and'], t))) AS INTEGER) AS stop_cnt,
        |  CAST(len(list_filter(w, t -> length(t) <= 2)) AS INTEGER) AS short_cnt
        |  FROM w),
        | q AS (SELECT doc_id, wc,
        |  ROUND(1.0 - 0.5 * (CAST(stop_cnt AS DOUBLE) / wc)
        |    - 0.3 * (CAST(short_cnt AS DOUBLE) / wc), 4) + 0.0 AS quality
        |  FROM c),
        | cs AS (SELECT doc_id, quality, wc,
        |  CAST(SUM(wc) OVER (ORDER BY quality DESC, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM q)
        |SELECT doc_id, quality, wc, cum_tokens,
        | (cum_tokens - wc) // 2500 AS shard
        |FROM cs ORDER BY doc_id""".stripMargin,

    // mirrors Pipeline.x28: per-source doc/token mass and the uniform-target
    // resampling weight (target_share / actual_share, n_src computed)
    "x28_mixture_weights" ->
      """WITH per AS (SELECT source, COUNT(*) AS docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        | FROM documents GROUP BY source),
        | tot AS (SELECT CAST(SUM(docs) AS BIGINT) AS total_docs, COUNT(*) AS n_src FROM per)
        |SELECT source, docs, tokens,
        | ROUND(CAST(docs AS DOUBLE) / CAST(total_docs AS DOUBLE), 4) + 0.0 AS share,
        | ROUND(CAST(total_docs AS DOUBLE) / CAST(n_src * docs AS DOUBLE), 4) + 0.0 AS weight
        |FROM per, tot ORDER BY source""".stripMargin,

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

    // u5: the SQL-function body inlined — exactly what Catalyst sees
    "u5_sql_udf" ->
      """SELECT l_returnflag,
        | CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |   AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc,
        | COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // j13: the salting is a PLAN property — the oracle states the plain
    // equi-join the salted result must equal
    "j13_salted_skew" ->
      """SELECT s_nationkey, COUNT(*) AS line_cnt,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "x31_bpe_pairs" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        | tf AS (SELECT w, COUNT(*) AS wc FROM w GROUP BY w),
        | p AS (SELECT wc,
        |   unnest(list_transform(range(1, length(w)), i -> substr(w, CAST(i AS INTEGER), 2))) AS pair
        |  FROM tf WHERE length(w) >= 2)
        |SELECT pair, CAST(SUM(wc) AS BIGINT) AS cnt
        |FROM p GROUP BY pair
        |ORDER BY cnt DESC, pair LIMIT 50""".stripMargin,

    // x32: x29's chunk CTEs + ordered FILTER'd string_agg reassembly;
    // a fully-deduped doc reassembles to the empty string (COALESCE)
    "x32_chunk_rewrite" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        | ch AS (SELECT doc_id,
        |   unnest(range((len(t) - 1) // 10 + 1)) AS idx,
        |   unnest(list_transform(range((len(t) - 1) // 10 + 1),
        |     i -> array_to_string(list_slice(t, i * 10 + 1, i * 10 + 10), ' '))) AS chunk
        |  FROM toks),
        | chh AS (SELECT doc_id, idx, chunk, md5(chunk) AS h FROM ch),
        | k1 AS (SELECT h, MIN(doc_id) AS kd FROM chh GROUP BY h),
        | keep AS (SELECT c.h, c.doc_id AS kd, MIN(c.idx) AS ki
        |  FROM chh c JOIN k1 ON c.h = k1.h AND c.doc_id = k1.kd
        |  GROUP BY c.h, c.doc_id)
        |SELECT c.doc_id, COUNT(*) AS n_chunks,
        | COUNT(*) FILTER (WHERE c.doc_id = k.kd AND c.idx = k.ki) AS kept_chunks,
        | COALESCE(string_agg(c.chunk, ' ' ORDER BY c.idx)
        |   FILTER (WHERE c.doc_id = k.kd AND c.idx = k.ki), '') AS clean_text
        |FROM chh c JOIN keep k USING (h)
        |GROUP BY c.doc_id ORDER BY doc_id""".stripMargin,

    // x29: chunk list built with zipped parallel unnests (l8's idiom);
    // survivor = lexicographic min (doc_id, idx) per chunk hash, expressed
    // as the two-step min-doc-then-min-idx rule (equal to Spark's
    // min(struct)); kept = this row holds the survivor position
    "x29_chunk_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        | ch AS (SELECT doc_id,
        |   unnest(range((len(t) - 1) // 10 + 1)) AS idx,
        |   unnest(list_transform(range((len(t) - 1) // 10 + 1),
        |     i -> md5(array_to_string(list_slice(t, i * 10 + 1, i * 10 + 10), ' ')))) AS h
        |  FROM toks),
        | k1 AS (SELECT h, MIN(doc_id) AS kd FROM ch GROUP BY h),
        | keep AS (SELECT c.h, c.doc_id AS kd, MIN(c.idx) AS ki
        |  FROM ch c JOIN k1 ON c.h = k1.h AND c.doc_id = k1.kd
        |  GROUP BY c.h, c.doc_id)
        |SELECT c.doc_id, COUNT(*) AS n_chunks,
        | COUNT(*) FILTER (WHERE c.doc_id = k.kd AND c.idx = k.ki) AS kept_chunks,
        | ROUND(CAST(COUNT(*) FILTER (WHERE c.doc_id = k.kd AND c.idx = k.ki) AS DOUBLE)
        |   / CAST(COUNT(*) AS DOUBLE), 4) + 0.0 AS kept_frac
        |FROM ch c JOIN keep k USING (h)
        |GROUP BY c.doc_id ORDER BY doc_id""".stripMargin,

    // x30: H = ln n - (sum c*ln c)/n with each term 9-dp-quantized to
    // DECIMAL before the sum (x13's discipline)
    "x30_token_entropy" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        | c AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY 1, 2),
        | agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
        |   COUNT(*) AS distinct_toks,
        |   SUM(CAST(ROUND(c * ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(18,9))) AS sclnc
        |  FROM c GROUP BY doc_id)
        |SELECT doc_id, n AS n_tokens, distinct_toks,
        | ROUND(ln(CAST(n AS DOUBLE)) - CAST(sclnc AS DOUBLE) / CAST(n AS DOUBLE), 4) + 0.0 AS entropy,
        | CASE WHEN distinct_toks > 1 THEN
        |   ROUND((ln(CAST(n AS DOUBLE)) - CAST(sclnc AS DOUBLE) / CAST(n AS DOUBLE))
        |     / ln(CAST(distinct_toks AS DOUBLE)), 4) + 0.0
        |  ELSE 0.0 END AS norm_entropy
        |FROM agg ORDER BY doc_id""".stripMargin,

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

    "x22_training_manifest" ->
      """WITH base AS (SELECT doc_id, lang, source, string_split(text, ' ') AS w,
        |  md5(lower(trim(text))) AS text_hash,
        |  substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h2,
        |  substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h1,
        |  CAST(regexp_extract(source, '([0-9]+)$', 1) AS INTEGER) AS sn
        | FROM documents),
        | surv AS (SELECT *,
        |  doc_id = MIN(doc_id) OVER (PARTITION BY text_hash) AS survivor
        | FROM base),
        | c AS (SELECT doc_id, lang, survivor, h2, h1, sn, w,
        |  CAST(len(w) AS BIGINT) AS wc,
        |  len(list_filter(w, t -> list_contains(['the','a','of','and'], t))) AS stop_cnt,
        |  len(list_filter(w, t -> length(t) <= 2)) AS short_cnt
        | FROM surv),
        | q AS (SELECT doc_id, lang, survivor, h2, h1, sn, wc,
        |  ROUND(1.0 - 0.5 * (CAST(stop_cnt AS DOUBLE) / wc)
        |    - 0.3 * (CAST(short_cnt AS DOUBLE) / wc), 4) + 0.0 AS quality,
        |  CASE WHEN len(w) >= 3 THEN
        |   ROUND(1.0 - CAST(len(list_distinct(list_transform(range(1, len(w) - 1),
        |     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS DOUBLE)
        |    / (len(w) - 2), 4) + 0.0
        |  ELSE 0.0 END AS rep_ratio
        | FROM c),
        | kept AS (SELECT lang, wc,
        |  CASE WHEN h1 IN ('c','d') THEN 'val'
        |       WHEN h1 IN ('e','f') THEN 'test'
        |       ELSE 'train' END AS split
        | FROM q
        | WHERE survivor AND wc BETWEEN 5 AND 5000
        |  AND quality >= 0.5 AND rep_ratio <= 0.2
        |  AND h2 < (CASE WHEN sn < 5 THEN 'zz' WHEN sn < 10 THEN '80'
        |            ELSE '40' END))
        |SELECT split, lang, COUNT(*) AS kept_docs,
        | CAST(SUM(wc) AS BIGINT) AS kept_tokens
        |FROM kept GROUP BY split, lang ORDER BY split, lang""".stripMargin,

    "x21_semdedup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        | cent AS (SELECT vec_id AS cent_id, emb AS cent_emb FROM e WHERE vec_id < 16),
        | sims AS (SELECT vec_id, cent_id,
        |   ROUND(list_cosine_similarity(emb, cent_emb), 4) + 0.0 AS csim
        |  FROM e, cent),
        | asgn AS (SELECT vec_id, cent_id AS cell FROM (
        |   SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS crn
        |   FROM sims) r WHERE crn = 1),
        | pr AS (SELECT a.cell, a.vec_id AS a_id, b.vec_id AS b_id,
        |   ROUND(list_cosine_similarity(ea.emb, eb.emb), 4) + 0.0 AS sim
        |  FROM asgn a JOIN asgn b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |   JOIN e ea ON a.vec_id = ea.vec_id JOIN e eb ON b.vec_id = eb.vec_id)
        |SELECT cell, a_id, b_id, sim FROM pr WHERE sim >= 0.35
        |ORDER BY cell, a_id, b_id""".stripMargin,

    // x21 with a LEARNED codebook: the full 2-iteration Lloyd trainer
    // (KMeansCodebook.trainMirrored) unrolled as a CTE chain — init = 16
    // smallest vec_ids; per iteration: 4-dp-rounded squared-L2 argmin
    // (cent_id tie-break), decimal-exact per-dimension component sums cast
    // to double BEFORE the count division, empty cells retain their prior
    // centroid via LEFT JOIN + COALESCE — then x21's cluster-scoped cosine
    // dedup against the trained centroids.
    "x21_semdedup_learned" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        | cb0 AS (SELECT vec_id AS cent_id, emb AS cent_emb FROM e ORDER BY vec_id LIMIT 16),
        | d1 AS (SELECT e.vec_id, c.cent_id,
        |   ROUND(list_sum(list_transform(range(64),
        |     i -> (e.emb[i+1] - c.cent_emb[i+1]) * (e.emb[i+1] - c.cent_emb[i+1]))), 4) + 0.0 AS dist2
        |  FROM e, cb0 c),
        | a1 AS (SELECT vec_id, cent_id AS cell FROM (
        |   SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cent_id) AS rn
        |   FROM d1) t WHERE rn = 1),
        | m1 AS (SELECT cell, pos,
        |   CAST(SUM(CAST(v AS DECIMAL(27,14))) AS DOUBLE) / COUNT(*) AS m
        |  FROM (SELECT a.cell, i AS pos, e.emb[i+1] AS v
        |    FROM a1 a JOIN e ON a.vec_id = e.vec_id,
        |     (SELECT unnest(range(64)) AS i) ii) s
        |  GROUP BY cell, pos),
        | n1 AS (SELECT cell AS cent_id, list(m ORDER BY pos) AS new_emb FROM m1 GROUP BY cell),
        | cb1 AS (SELECT c.cent_id, COALESCE(n.new_emb, c.cent_emb) AS cent_emb
        |  FROM cb0 c LEFT JOIN n1 n ON c.cent_id = n.cent_id),
        | d2 AS (SELECT e.vec_id, c.cent_id,
        |   ROUND(list_sum(list_transform(range(64),
        |     i -> (e.emb[i+1] - c.cent_emb[i+1]) * (e.emb[i+1] - c.cent_emb[i+1]))), 4) + 0.0 AS dist2
        |  FROM e, cb1 c),
        | a2 AS (SELECT vec_id, cent_id AS cell FROM (
        |   SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cent_id) AS rn
        |   FROM d2) t WHERE rn = 1),
        | m2 AS (SELECT cell, pos,
        |   CAST(SUM(CAST(v AS DECIMAL(27,14))) AS DOUBLE) / COUNT(*) AS m
        |  FROM (SELECT a.cell, i AS pos, e.emb[i+1] AS v
        |    FROM a2 a JOIN e ON a.vec_id = e.vec_id,
        |     (SELECT unnest(range(64)) AS i) ii) s
        |  GROUP BY cell, pos),
        | n2 AS (SELECT cell AS cent_id, list(m ORDER BY pos) AS new_emb FROM m2 GROUP BY cell),
        | cb2 AS (SELECT c.cent_id, COALESCE(n.new_emb, c.cent_emb) AS cent_emb
        |  FROM cb1 c LEFT JOIN n2 n ON c.cent_id = n.cent_id),
        | sims AS (SELECT e.vec_id, c.cent_id,
        |   ROUND(list_cosine_similarity(e.emb, c.cent_emb), 4) + 0.0 AS csim
        |  FROM e, cb2 c),
        | asgn AS (SELECT vec_id, cent_id AS cell FROM (
        |   SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS crn
        |   FROM sims) r WHERE crn = 1),
        | pr AS (SELECT a.cell, a.vec_id AS a_id, b.vec_id AS b_id,
        |   ROUND(list_cosine_similarity(ea.emb, eb.emb), 4) + 0.0 AS sim
        |  FROM asgn a JOIN asgn b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |   JOIN e ea ON a.vec_id = ea.vec_id JOIN e eb ON b.vec_id = eb.vec_id)
        |SELECT cell, a_id, b_id, sim FROM pr WHERE sim >= 0.35
        |ORDER BY cell, a_id, b_id""".stripMargin,

    "x9_ann_lsh" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        | eb AS (SELECT vec_id, k AS band,
        |   CAST(list_sum(list_transform(range(4),
        |     j -> CASE WHEN emb[4*k + j + 1] > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END)) AS BIGINT) AS bval
        |  FROM e, (SELECT unnest(range(16)) AS k) ks),
        | cand AS (SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS c_id
        |  FROM eb a JOIN eb b ON a.band = b.band AND a.bval = b.bval
        |   AND a.vec_id < 10 AND a.vec_id <> b.vec_id),
        | scored AS (SELECT c.q_id, c.c_id,
        |   ROUND(list_cosine_similarity(eq.emb, ec.emb), 4) + 0.0 AS sim
        |  FROM cand c JOIN e eq ON c.q_id = eq.vec_id JOIN e ec ON c.c_id = ec.vec_id)
        |SELECT q_id, rnk, c_id, sim FROM (
        | SELECT q_id, c_id, sim,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS INTEGER) AS rnk
        | FROM scored) t
        |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin,

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

    "j14_fuzzy_join" ->
      """WITH pairs AS (SELECT a.p_partkey, a.p_brand, a.p_name,
        |   levenshtein(a.p_name, b.p_name) AS dist
        |  FROM part a JOIN part b
        |   ON a.p_brand = b.p_brand AND a.p_partkey <> b.p_partkey
        |  WHERE abs(length(a.p_name) - length(b.p_name)) <= 3
        |   AND a.p_name <> b.p_name
        |   AND levenshtein(a.p_name, b.p_name) <= 3)
        |SELECT p_partkey, p_brand, p_name, COUNT(*) AS n_sim,
        | CAST(MIN(dist) AS INT) AS min_dist
        |FROM pairs GROUP BY p_partkey, p_brand, p_name
        |ORDER BY p_partkey""".stripMargin,

    // j15: the binning is a PLAN property — the oracle states the plain
    // interval-overlap theta-join the binned equi-join must equal
    "j15_interval_overlap" ->
      """WITH li AS (SELECT l_partkey AS pk, l_orderkey AS ok,
        |   l_linenumber AS ln, l_suppkey AS sk,
        |   CAST(CAST(l_shipdate AS DATE) - DATE '1992-01-01' AS INT) AS st,
        |   CAST(CAST(l_shipdate AS DATE) - DATE '1992-01-01' AS INT)
        |     + CAST(l_quantity AS INT) AS en
        |  FROM lineitem)
        |SELECT a.pk, COUNT(*) AS overlap_pairs
        |FROM li a JOIN li b ON a.pk = b.pk
        | AND (a.ok < b.ok OR (a.ok = b.ok AND a.ln < b.ln))
        |WHERE a.st <= b.en AND b.st <= a.en AND a.sk <> b.sk
        |GROUP BY a.pk ORDER BY a.pk""".stripMargin,

    // r9: the degree orientation is a PLAN property — the triangle set is
    // invariant to the orienting total order, so the oracle uses plain
    // partkey order
    "r9_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
        |   FROM lineitem),
        | e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |   FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
        | tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |   FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
        |   JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
        | nodes AS (SELECT unnest([a, b, c]) AS p FROM tri),
        | deg AS (SELECT p, COUNT(*) AS dg FROM
        |   (SELECT u AS p FROM e UNION ALL SELECT v AS p FROM e) b GROUP BY p)
        |SELECT n.p AS p_partkey, deg.dg AS deg, COUNT(*) AS tri_cnt
        |FROM nodes n JOIN deg ON n.p = deg.p
        |GROUP BY n.p, deg.dg ORDER BY p_partkey""".stripMargin,

    // r10: TopKPerGroup is a PLAN property — the oracle states the plain
    // window+filter top-5 the bounded-heap operator must equal
    "r10_bipartite_proj" ->
      """WITH sp AS (SELECT DISTINCT l_suppkey AS sk, l_partkey AS p
        |   FROM lineitem),
        | sz AS (SELECT sk, COUNT(*) AS n FROM sp GROUP BY sk),
        | pr AS (SELECT a.sk AS s1, b.sk AS s2, COUNT(*) AS common
        |   FROM sp a JOIN sp b ON a.p = b.p AND a.sk <> b.sk GROUP BY 1, 2),
        | sc AS (SELECT s1, s2, common,
        |   ROUND(CAST(common AS DOUBLE)
        |     / CAST(x.n + y.n - common AS DOUBLE), 4) + 0.0 AS jac
        |  FROM pr JOIN sz x ON pr.s1 = x.sk JOIN sz y ON pr.s2 = y.sk)
        |SELECT s1, rnk, s2, common, jac FROM (
        | SELECT s1, s2, common, jac,
        |  CAST(row_number() OVER
        |   (PARTITION BY s1 ORDER BY jac DESC, s2) AS INTEGER) AS rnk
        | FROM sc) t
        |WHERE rnk <= 5 ORDER BY s1, rnk""".stripMargin,

    // r11: the frontier/anti-join BSP execution is a PLAN property — the
    // oracle states the closure as a recursive CTE with UNION dedup;
    // MIN(dist) = first-discovery round by BFS construction
    "r11_bfs" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem) a
        |  JOIN (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem) b
        |   ON a.ok = b.ok AND a.p < b.p),
        | und AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        | bfs(n, dist) AS (
        |  SELECT DISTINCT u AS n, 0 AS dist FROM und WHERE u % 100 = 0
        |  UNION
        |  SELECT und.v AS n, bfs.dist + 1 AS dist
        |  FROM bfs JOIN und ON bfs.n = und.u WHERE bfs.dist < 4)
        |SELECT n, CAST(MIN(dist) AS INT) AS dist FROM bfs
        |GROUP BY n ORDER BY n""".stripMargin,

    // r12: full-relax unrolled CTEs — identical ≤k-edge minimum to the
    // Spark side's delta relaxation; all BIGINT integer math
    "r12_sssp_bounded" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
        |   FROM lineitem),
        | p0 AS (SELECT a.p AS u, b.p AS v, COUNT(*) AS co
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p
        |  GROUP BY a.p, b.p),
        | e AS (SELECT u, v, GREATEST(1, 10 - co) AS w FROM p0
        |  UNION ALL SELECT v, u, GREATEST(1, 10 - co) FROM p0),
        | d0 AS (SELECT MIN(u) AS n, CAST(0 AS BIGINT) AS dist FROM e),
        | d1 AS (SELECT n, MIN(dist) AS dist FROM (
        |   SELECT n, dist FROM d0 UNION ALL
        |   SELECT e.v, d0.dist + e.w FROM d0 JOIN e ON e.u = d0.n) GROUP BY n),
        | d2 AS (SELECT n, MIN(dist) AS dist FROM (
        |   SELECT n, dist FROM d1 UNION ALL
        |   SELECT e.v, d1.dist + e.w FROM d1 JOIN e ON e.u = d1.n) GROUP BY n),
        | d3 AS (SELECT n, MIN(dist) AS dist FROM (
        |   SELECT n, dist FROM d2 UNION ALL
        |   SELECT e.v, d2.dist + e.w FROM d2 JOIN e ON e.u = d2.n) GROUP BY n)
        |SELECT n AS p_partkey, dist FROM d3 ORDER BY p_partkey""".stripMargin,

    // u6: buffer scaling is an IMPLEMENTATION property — the oracle states
    // per-dimension DECIMAL(18,6) sums, the exact value the scaled-long
    // buffer carries
    "u6_centroid_agg" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS emb
        |   FROM embeddings),
        | x AS (SELECT label, j, CAST(emb[j + 1] AS DECIMAL(18,6)) AS v
        |   FROM e, (SELECT unnest(range(64)) AS j) js),
        | m AS (SELECT label, j,
        |   ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 4) + 0.0 AS c
        |  FROM x GROUP BY label, j),
        | n AS (SELECT label, COUNT(*) AS n_vecs FROM e GROUP BY label)
        |SELECT m.label, n.n_vecs, CAST(m.j AS INT) AS dim, m.c AS c
        |FROM m JOIN n ON m.label = n.label
        |ORDER BY m.label, dim""".stripMargin,

    // x35: registers are order-free maxes over md5-derived ints and the
    // dyadic register sum is exact in double, so the "approximation" is a
    // pure function of the input set — hash-comparable like any exact query
    "x35_hll_users" ->
      """WITH h AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h
        |   FROM events),
        | hv AS (SELECT event_type,
        |   CAST(CAST(('0x' || substr(h, 1, 2)) AS UBIGINT) AS INT) AS bucket,
        |   CAST(CAST(('0x' || substr(h, 3, 8)) AS UBIGINT) AS BIGINT) AS v
        |  FROM h),
        | regs AS (SELECT event_type, bucket,
        |   MAX(CASE WHEN v = 0 THEN 33 ELSE 33 - length(bin(v)) END) AS rho
        |  FROM hv GROUP BY event_type, bucket),
        | pt AS (SELECT event_type, COUNT(*) AS present,
        |   SUM(power(CAST(2 AS DOUBLE), -CAST(rho AS DOUBLE))) AS ssum
        |  FROM regs GROUP BY event_type),
        | est AS (SELECT event_type, 256 - present AS zeros,
        |   0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0
        |     / (CAST(256 - present AS DOUBLE) + ssum) AS e_raw
        |  FROM pt),
        | fin AS (SELECT event_type,
        |   ROUND(CASE WHEN e_raw <= 2.5 * 256.0 AND zeros > 0
        |     THEN 256.0 * ln(256.0 / CAST(zeros AS DOUBLE))
        |     ELSE e_raw END, 4) AS hll_est
        |  FROM est),
        | ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        |  FROM events GROUP BY event_type)
        |SELECT ex.event_type, ex.n_users, fin.hll_est,
        | ROUND((fin.hll_est - ex.n_users)
        |   / CAST(ex.n_users AS DOUBLE), 4) + 0.0 AS rel_err
        |FROM ex JOIN fin ON ex.event_type = fin.event_type
        |ORDER BY ex.event_type""".stripMargin,

    // x36: every register is an exact integer sum — order-free, mergeable
    "x36_cms_words" ->
      """WITH wx AS (SELECT unnest(string_split(text, ' ')) AS w
        |   FROM documents),
        | wc AS (SELECT w, COUNT(*) AS cnt FROM wx GROUP BY w),
        | cells AS (SELECT i AS r,
        |   CAST(('0x' || substr(md5(i || ':' || w), 1, 8)) AS UBIGINT)
        |     % 1024 AS c,
        |   CAST(SUM(cnt) AS BIGINT) AS reg
        |  FROM wc, (SELECT unnest(range(4)) AS i) iis GROUP BY 1, 2),
        | top AS (SELECT w, cnt FROM wc ORDER BY cnt DESC, w LIMIT 20),
        | probes AS (SELECT w, cnt, i AS pr,
        |   CAST(('0x' || substr(md5(i || ':' || w), 1, 8)) AS UBIGINT)
        |     % 1024 AS pc
        |  FROM top, (SELECT unnest(range(4)) AS i) iis)
        |SELECT p.w, p.cnt AS true_cnt, MIN(cells.reg) AS cms_est,
        | MIN(cells.reg) - p.cnt AS overcount
        |FROM probes p JOIN cells ON p.pr = cells.r AND p.pc = cells.c
        |GROUP BY p.w, p.cnt ORDER BY true_cnt DESC, p.w""".stripMargin,

    "x37_corpus_stats" ->
      """WITH base AS (SELECT doc_id, lang, source,
        |   CAST(len(string_split(text, ' ')) AS BIGINT) AS wc,
        |   md5(lower(trim(text))) AS h
        |  FROM documents),
        | mass AS (SELECT COUNT(*) AS n_docs, SUM(wc) AS n_tokens,
        |   COUNT(DISTINCT lang) AS n_langs,
        |   COUNT(DISTINCT source) AS n_sources
        |  FROM base),
        | dups AS (SELECT COUNT(*) AS n_distinct,
        |   SUM(c - 1) AS dup_docs
        |  FROM (SELECT h, COUNT(*) AS c FROM base GROUP BY h) g)
        |SELECT n_docs, CAST(n_tokens AS BIGINT) AS n_tokens, n_langs,
        | n_sources, n_distinct, CAST(dup_docs AS BIGINT) AS dup_docs,
        | ROUND(CAST(dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE), 4)
        |   AS dup_frac,
        | ROUND(CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE), 4)
        |   AS mean_tokens
        |FROM mass, dups ORDER BY n_docs""".stripMargin,

    "f12_trig" ->
      """SELECT p_partkey,
        | ROUND(sin(p_size), 4) + 0.0 AS size_sin,
        | ROUND(cos(p_size), 4) + 0.0 AS size_cos,
        | ROUND(tan(p_size), 4) + 0.0 AS size_tan,
        | ROUND(atan(p_size), 4) + 0.0 AS size_atan,
        | ROUND(atan2(CAST(p_size AS DOUBLE),
        |   CAST(p_retailprice AS DOUBLE)), 4) + 0.0 AS sz_atan2,
        | ROUND(degrees(p_size), 4) + 0.0 AS size_deg,
        | ROUND(radians(p_size), 4) + 0.0 AS size_rad
        |FROM part ORDER BY p_partkey""".stripMargin,

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

    "x38_incr_dedup" ->
      """WITH docs AS (SELECT doc_id, md5(lower(trim(text))) AS h
        |   FROM documents),
        | corpus AS (SELECT DISTINCT h FROM docs WHERE doc_id % 5 <> 4),
        | batch AS (SELECT doc_id, h FROM docs WHERE doc_id % 5 = 4),
        | fb AS (SELECT h, MIN(doc_id) AS first_id FROM batch GROUP BY h)
        |SELECT b.doc_id,
        | CASE WHEN c.h IS NOT NULL THEN 'dup_of_corpus'
        |  WHEN b.doc_id <> fb.first_id THEN 'dup_in_batch'
        |  ELSE 'unique' END AS status,
        | fb.first_id
        |FROM batch b LEFT JOIN corpus c ON b.h = c.h
        | JOIN fb ON b.h = fb.h
        |ORDER BY b.doc_id""".stripMargin,

    // x57: x1's banding CTEs verbatim (sig/bands), batch split by x38's
    // doc_id % 5 convention, signature-only verification (≥ 6 of 8 slots,
    // x44's agreement chain) — never the corpus text
    "x57_incr_neardup" -> (x1Ctes +
      """,
        | bc AS (SELECT DISTINCT b.doc_id, c.doc_id AS partner
        |  FROM bands b JOIN bands c
        |   ON b.lang = c.lang AND b.pos = c.pos AND b.bh = c.bh
        |  WHERE b.doc_id % 5 = 4 AND c.doc_id % 5 <> 4),
        | bb AS (SELECT DISTINCT b.doc_id, c.doc_id AS partner
        |  FROM bands b JOIN bands c
        |   ON b.lang = c.lang AND b.pos = c.pos AND b.bh = c.bh
        |  WHERE b.doc_id % 5 = 4 AND c.doc_id % 5 = 4 AND c.doc_id < b.doc_id),
        | vc AS (SELECT p.doc_id, MIN(p.partner) AS corpus_partner
        |  FROM bc p JOIN sig sa ON p.doc_id = sa.doc_id
        |   JOIN sig sb ON p.partner = sb.doc_id
        |  WHERE (CASE WHEN sa.mh0 = sb.mh0 THEN 1 ELSE 0 END
        |   + CASE WHEN sa.mh1 = sb.mh1 THEN 1 ELSE 0 END
        |   + CASE WHEN sa.mh2 = sb.mh2 THEN 1 ELSE 0 END
        |   + CASE WHEN sa.mh3 = sb.mh3 THEN 1 ELSE 0 END
        |   + CASE WHEN sa.mh4 = sb.mh4 THEN 1 ELSE 0 END
        |   + CASE WHEN sa.mh5 = sb.mh5 THEN 1 ELSE 0 END
        |   + CASE WHEN sa.mh6 = sb.mh6 THEN 1 ELSE 0 END
        |   + CASE WHEN sa.mh7 = sb.mh7 THEN 1 ELSE 0 END) >= 6
        |  GROUP BY p.doc_id),
        | vb AS (SELECT p.doc_id, MIN(p.partner) AS batch_partner
        |  FROM bb p JOIN sig sa ON p.doc_id = sa.doc_id
        |   JOIN sig sb ON p.partner = sb.doc_id
        |  WHERE (CASE WHEN sa.mh0 = sb.mh0 THEN 1 ELSE 0 END
        |   + CASE WHEN sa.mh1 = sb.mh1 THEN 1 ELSE 0 END
        |   + CASE WHEN sa.mh2 = sb.mh2 THEN 1 ELSE 0 END
        |   + CASE WHEN sa.mh3 = sb.mh3 THEN 1 ELSE 0 END
        |   + CASE WHEN sa.mh4 = sb.mh4 THEN 1 ELSE 0 END
        |   + CASE WHEN sa.mh5 = sb.mh5 THEN 1 ELSE 0 END
        |   + CASE WHEN sa.mh6 = sb.mh6 THEN 1 ELSE 0 END
        |   + CASE WHEN sa.mh7 = sb.mh7 THEN 1 ELSE 0 END) >= 6
        |  GROUP BY p.doc_id),
        | roster AS (SELECT doc_id FROM sig WHERE doc_id % 5 = 4)
        |SELECT r.doc_id,
        | CASE WHEN vc.corpus_partner IS NOT NULL THEN 'dup_of_corpus'
        |  WHEN vb.batch_partner IS NOT NULL THEN 'dup_in_batch'
        |  ELSE 'unique' END AS status,
        | CASE WHEN vc.corpus_partner IS NOT NULL THEN vc.corpus_partner
        |  ELSE vb.batch_partner END AS partner_id
        |FROM roster r LEFT JOIN vc ON r.doc_id = vc.doc_id
        | LEFT JOIN vb ON r.doc_id = vb.doc_id
        |ORDER BY r.doc_id""".stripMargin),

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

    // r17: the oriented enumeration is a PLAN property (r9's argument) —
    // the oracle states the plain partkey-ordered 3-way self-join
    "r17_clustering" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
        |   FROM lineitem),
        | e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |   FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
        | tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |   FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
        |   JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
        | tn AS (SELECT unnest([a, b, c]) AS p FROM tri),
        | tc AS (SELECT p, COUNT(*) AS tri_cnt FROM tn GROUP BY p),
        | deg AS (SELECT p, COUNT(*) AS dg FROM
        |   (SELECT u AS p FROM e UNION ALL SELECT v AS p FROM e) b GROUP BY p)
        |SELECT deg.p AS p_partkey, deg.dg AS deg,
        | COALESCE(tc.tri_cnt, 0) AS tri_cnt,
        | ROUND(2.0 * COALESCE(tc.tri_cnt, 0)
        |   / CAST(deg.dg * (deg.dg - 1) AS DOUBLE), 4) + 0.0 AS cc
        |FROM deg LEFT JOIN tc ON deg.p = tc.p
        |WHERE deg.dg >= 2
        |ORDER BY p_partkey""".stripMargin,

    "x58_prefix_dedup" ->
      """WITH p AS (SELECT doc_id,
        |  md5(array_to_string(string_split(text, ' ')[1:20], ' ')) AS prefix_hash,
        |  md5(lower(trim(text))) AS fh FROM documents),
        | g AS (SELECT prefix_hash, MIN(doc_id) AS survivor_id,
        |  COUNT(*) AS n_docs, COUNT(DISTINCT fh) AS n_full_variants
        |  FROM p GROUP BY prefix_hash)
        |SELECT survivor_id, prefix_hash, n_docs, n_full_variants FROM g
        |WHERE n_docs >= 2 ORDER BY survivor_id""".stripMargin,

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

    // f16: Spark's thresholded levenshtein returns −1 past the bound —
    // mirrored as a CASE over the plain distance (same value by definition)
    "f16_editdist" ->
      """SELECT p_partkey,
        | CAST(levenshtein(p_brand, 'Brand#00') AS BIGINT) AS brand_dist,
        | CAST(levenshtein(p_name, p_type) AS BIGINT) AS name_type_dist,
        | CAST(CASE WHEN levenshtein(p_name, p_type) <= 9
        |   THEN levenshtein(p_name, p_type) ELSE -1 END AS BIGINT)
        |  AS name_type_capped,
        | ROUND(1.0 - CAST(levenshtein(p_name, p_type) AS DOUBLE)
        |   / CAST(greatest(length(p_name), length(p_type)) AS DOUBLE), 4)
        |  + 0.0 AS name_type_sim
        |FROM part ORDER BY p_partkey""".stripMargin,

    // x59: bucket = (20·|∩|) // |∪| on the verified pair's exact integers —
    // the 4-dp float jaccard never enters the bucketing on either engine
    "x59_jaccard_sweep" -> (x1Ctes +
      """,
        | v AS (SELECT (CAST(len(list_intersect(ta.t, tb.t)) AS BIGINT) * 20)
        |    // len(list_distinct(ta.t || tb.t)) AS bucket
        |  FROM cand c JOIN toks ta ON c.a_id = ta.doc_id
        |   JOIN toks tb ON c.b_id = tb.doc_id
        |  WHERE 10 * len(list_intersect(ta.t, tb.t))
        |   >= 7 * len(list_distinct(ta.t || tb.t)))
        |SELECT bucket, CAST(bucket AS DOUBLE) / 20 AS thr_lo,
        | COUNT(*) AS n_pairs
        |FROM v GROUP BY bucket ORDER BY bucket""".stripMargin),

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

    "l9_keyword_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        | tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        | df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        | n AS (SELECT COUNT(*) AS n FROM documents),
        | sc AS (SELECT doc_id, tf.term,
        |   CAST(CAST(tf AS DECIMAL(10,0))
        |    * CAST(ROUND(ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE)), 9)
        |      AS DECIMAL(18,9)) AS DOUBLE) AS score
        |  FROM tf JOIN df ON tf.term = df.term, n),
        | r AS (SELECT doc_id, term, score,
        |   ROW_NUMBER() OVER (PARTITION BY doc_id
        |     ORDER BY score DESC, term) AS rk
        |  FROM sc)
        |SELECT doc_id, rk, term, score
        |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "f13_regex" ->
      """SELECT p_partkey,
        | regexp_extract(p_name, '^[a-z]+') AS first_word,
        | regexp_extract(p_name, '[a-z]+$') AS last_word,
        | regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
        | length(p_name)
        |  - length(regexp_replace(p_name, '[aeiou]', '', 'g')) AS n_vowels,
        | regexp_matches(p_name, 'widget$') AS is_widget
        |FROM part ORDER BY p_partkey""".stripMargin,

    "j16_asof_nearest" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |   CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind,
        |   CASE WHEN event_type = 'click' THEN event_id END AS ck_id,
        |   CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS ck_ts
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        | wq AS (SELECT *,
        |   last_value(ck_id IGNORE NULLS) OVER wb AS b_id,
        |   last_value(ck_ts IGNORE NULLS) OVER wb AS b_ts,
        |   first_value(ck_id IGNORE NULLS) OVER wf AS f_id,
        |   first_value(ck_ts IGNORE NULLS) OVER wf AS f_ts
        |  FROM e WINDOW
        |   wb AS (PARTITION BY user_id ORDER BY ts_us, kind, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |   wf AS (PARTITION BY user_id ORDER BY ts_us, kind, event_id
        |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        | q AS (SELECT *,
        |   b_ts IS NOT NULL AND ts_us - b_ts <= 3600000000 AS b_ok,
        |   f_ts IS NOT NULL AND f_ts - ts_us <= 3600000000 AS f_ok
        |  FROM wq WHERE kind = 1),
        | pick AS (SELECT *,
        |   b_ok AND (NOT f_ok OR ts_us - b_ts <= f_ts - ts_us) AS use_b
        |  FROM q WHERE b_ok OR f_ok)
        |SELECT event_id, user_id, ts_us AS purchase_ts,
        | CASE WHEN use_b THEN b_id ELSE f_id END AS click_event_id,
        | CASE WHEN use_b THEN b_ts ELSE f_ts END - ts_us AS delta_us
        |FROM pick ORDER BY event_id""".stripMargin,

    "x39_domain_cap" ->
      """WITH r AS (SELECT source, doc_id, n_chars,
        |   ROW_NUMBER() OVER (PARTITION BY source
        |     ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents),
        | k AS (SELECT source, COUNT(*) AS kept_docs,
        |   CAST(SUM(n_chars) AS BIGINT) AS kept_chars
        |  FROM r WHERE rn <= 10 GROUP BY 1),
        | t AS (SELECT source, COUNT(*) AS total_docs,
        |   CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |  FROM documents GROUP BY 1)
        |SELECT t.source, total_docs, kept_docs,
        | total_docs - kept_docs AS dropped_docs, kept_chars,
        | ROUND(CAST(kept_chars AS DOUBLE)
        |   / CAST(total_chars AS DOUBLE), 4) AS kept_char_frac
        |FROM t JOIN k USING (source) ORDER BY source""".stripMargin,

    "j17_bloom_semi" ->
      """SELECT s_suppkey, s_name, COUNT(*) AS n_items,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |   AS DECIMAL(18,2)) AS DOUBLE) AS revenue
        |FROM lineitem
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_nationkey < 5
        |GROUP BY 1, 2 ORDER BY s_suppkey""".stripMargin,

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

    "f14_datetrunc" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
        | date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
        | date_trunc('quarter', CAST(o_orderdate AS DATE)) AS quarter_start,
        | date_trunc('week', CAST(o_orderdate AS DATE)) AS week_start,
        | last_day(CAST(o_orderdate AS DATE)) AS month_end,
        | CAST(last_day(CAST(o_orderdate AS DATE))
        |   - date_trunc('month', CAST(o_orderdate AS DATE)) + 1
        |  AS BIGINT) AS days_in_month
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "x40_curation_funnel" ->
      """WITH docs AS (SELECT doc_id, lang, source, n_chars,
        |   md5(lower(trim(text))) AS h FROM documents),
        | s1 AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER
        |    (PARTITION BY h ORDER BY doc_id) AS rn FROM docs) WHERE rn = 1),
        | s2 AS (SELECT * FROM s1 WHERE lang = 'en'),
        | s3 AS (SELECT * FROM s2 WHERE n_chars >= 150),
        | s4 AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER
        |    (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn2
        |   FROM s3) WHERE rn2 <= 10),
        | acct AS (
        |  SELECT 0 AS stage, 'raw' AS stage_name, COUNT(*) AS docs FROM docs
        |  UNION ALL SELECT 1, 'exact_dedup', COUNT(*) FROM s1
        |  UNION ALL SELECT 2, 'lang_en', COUNT(*) FROM s2
        |  UNION ALL SELECT 3, 'min_length', COUNT(*) FROM s3
        |  UNION ALL SELECT 4, 'domain_cap', COUNT(*) FROM s4)
        |SELECT stage, stage_name,
        | LAG(docs) OVER (ORDER BY stage) AS docs_in, docs AS docs_out,
        | ROUND(CAST(docs AS DOUBLE)
        |   / CAST(LAG(docs) OVER (ORDER BY stage) AS DOUBLE), 4)
        |  AS retained_frac
        |FROM acct ORDER BY stage""".stripMargin,

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

    "u7_typed_mapgroups" ->
      """SELECT c_nationkey, COUNT(*) AS n_cust,
        | CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
        |   AS DECIMAL(18,2)) AS DOUBLE) AS total_bal,
        | MIN(c_custkey) AS min_custkey, MAX(c_custkey) AS max_custkey
        |FROM customer GROUP BY 1 ORDER BY c_nationkey""".stripMargin,

    "j18_not_exists" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    "x41_shard_audit" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | c AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS wc,
        |  CAST(len(list_filter(w, t -> list_contains(['the','a','of','and'], t))) AS INTEGER) AS stop_cnt,
        |  CAST(len(list_filter(w, t -> length(t) <= 2)) AS INTEGER) AS short_cnt
        |  FROM w),
        | q AS (SELECT doc_id, wc,
        |  ROUND(1.0 - 0.5 * (CAST(stop_cnt AS DOUBLE) / wc)
        |    - 0.3 * (CAST(short_cnt AS DOUBLE) / wc), 4) + 0.0 AS quality
        |  FROM c),
        | cs AS (SELECT doc_id, quality, wc,
        |  CAST(SUM(wc) OVER (ORDER BY quality DESC, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM q)
        |SELECT (cum_tokens - wc) // 2500 AS shard, COUNT(*) AS n_docs,
        | CAST(SUM(wc) AS BIGINT) AS tokens,
        | MIN(cum_tokens - wc) AS start_tok, MAX(cum_tokens) AS end_tok,
        | ROUND(CAST(SUM(wc) AS DOUBLE) / 2500.0, 4) AS fill_frac
        |FROM cs GROUP BY 1 ORDER BY shard""".stripMargin,

    // x42: trigram extraction is x3's idiom; COUNT/COUNT-FILTER are BIGINT
    // in DuckDB (no HUGEINT risk); novelty mirrors round4fast = plain ROUND
    "x42_ngram_novelty" ->
      """WITH tg AS (SELECT DISTINCT doc_id,
        |  unnest(list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |   i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
        |        || ' ' || string_split(text, ' ')[i+2]))) AS tri
        | FROM documents),
        | f AS (SELECT tri, MIN(doc_id) AS first_doc FROM tg GROUP BY tri)
        |SELECT tg.doc_id, COUNT(*) AS n_tri,
        | COUNT(*) FILTER (WHERE f.first_doc = tg.doc_id) AS n_novel,
        | ROUND(CAST(COUNT(*) FILTER (WHERE f.first_doc = tg.doc_id) AS DOUBLE)
        |   / COUNT(*), 4) AS novelty
        |FROM tg JOIN f USING (tri)
        |GROUP BY tg.doc_id ORDER BY tg.doc_id""".stripMargin,

    // x43: ln-parity discipline (x30): every ln argument is an integer
    // count, each term quantized to DECIMAL(18,9) before the exact sum;
    // integer SUMs cast to BIGINT (D9); kl crosses 0 under quantization
    // noise -> ROUND + 0.0 (round4nz mirror)
    "x43_kl_drift" ->
      """WITH sw AS (SELECT source, w, COUNT(*) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents) GROUP BY source, w),
        | cw AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cw FROM sw GROUP BY w),
        | tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_corpus FROM sw)
        |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
        | COUNT(*) AS vocab,
        | ROUND((CAST(SUM(CAST(round(c * ln(c), 9) AS DECIMAL(18,9))) AS DOUBLE)
        |    - CAST(SUM(CAST(round(c * ln(cw), 9) AS DECIMAL(18,9))) AS DOUBLE))
        |   / CAST(SUM(c) AS DOUBLE)
        |   - ln(CAST(SUM(c) AS DOUBLE)) + ln(CAST(n_corpus AS DOUBLE)), 4)
        |  + 0.0 AS kl
        |FROM sw JOIN cw USING (w), tot
        |GROUP BY source, n_corpus ORDER BY source""".stripMargin,

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

    // x45: ln args all INTEGER counts; per-term round(.,9) DECIMAL(18,9)
    // quantization before each sum (exact, order-free); the final
    // combination textually mirrors the Spark expression (x43 discipline)
    "x45_dsir_weights" ->
      """WITH dw AS (SELECT doc_id, lang, w, COUNT(*) AS c
        |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |        FROM documents) GROUP BY doc_id, lang, w),
        | ct AS (SELECT w, CAST(SUM(c) AS BIGINT) AS ct FROM dw
        |        WHERE lang = 'en' GROUP BY w),
        | cc AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cw FROM dw GROUP BY w),
        | tot AS (SELECT CAST(SUM(cw) AS BIGINT) AS n_corpus,
        |        COUNT(*) AS vocab FROM cc),
        | tt AS (SELECT CAST(SUM(ct) AS BIGINT) AS n_target FROM ct)
        |SELECT dw.doc_id, dw.lang, CAST(SUM(dw.c) AS BIGINT) AS n_tokens,
        | ROUND(
        |   CAST(SUM(CAST(round(dw.c * ln(COALESCE(ct.ct, 0) + 1), 9)
        |     AS DECIMAL(18,9))) AS DOUBLE)
        |   - CAST(SUM(CAST(round(dw.c * ln(cc.cw), 9)
        |     AS DECIMAL(18,9))) AS DOUBLE)
        |   + CAST(SUM(dw.c) AS DOUBLE)
        |     * (ln(CAST(n_corpus AS DOUBLE))
        |        - ln(CAST(n_target + vocab AS DOUBLE))), 4) + 0.0 AS logw
        |FROM dw JOIN cc USING (w) LEFT JOIN ct USING (w), tot, tt
        |GROUP BY dw.doc_id, dw.lang, n_corpus, vocab, n_target
        |ORDER BY doc_id""".stripMargin,

    // x46: sqrt is IEEE-correctly-rounded on both engines; each sqrt(p)
    // quantized to DECIMAL(18,9) before the normalizing sum
    "x46_temperature_mix" ->
      """WITH per AS (SELECT source, COUNT(*) AS docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        | FROM documents GROUP BY source),
        | tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS n_total FROM per),
        | wr AS (SELECT source, docs, tokens, n_total,
        |   CAST(round(sqrt(CAST(tokens AS DOUBLE) / CAST(n_total AS DOUBLE)),
        |     9) AS DECIMAL(18,9)) AS r
        |  FROM per, tot),
        | nm AS (SELECT SUM(r) AS sum_r FROM wr)
        |SELECT source, docs, tokens,
        | ROUND(CAST(tokens AS DOUBLE) / CAST(n_total AS DOUBLE), 4)
        |   + 0.0 AS share,
        | ROUND(CAST(r AS DOUBLE) / CAST(sum_r AS DOUBLE), 4)
        |   + 0.0 AS tweight
        |FROM wr, nm ORDER BY source""".stripMargin,

    // j19: the oracle states the PLAIN band predicate — the bucketed
    // equi-join rewrite is a plan property, invisible in the result
    "j19_band_bucket" ->
      """SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal,
        | ROUND(abs(s_acctbal - c_acctbal), 4) + 0.0 AS bal_diff
        |FROM supplier, customer
        |WHERE abs(s_acctbal - c_acctbal) <= 25.0
        |ORDER BY s_suppkey, c_custkey""".stripMargin,

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

    // x47: u6's exact centroid algebra; every squared deviation
    // round(.,9)-quantized to DECIMAL(18,9) before its sum (order-free);
    // argmin tie-broken by label; ratios textually mirror the Spark expr
    "x47_cluster_sep" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
        |   FROM embeddings),
        | x AS (SELECT vec_id, label, j, emb[j + 1] AS v
        |   FROM e, (SELECT unnest(range(64)) AS j) js),
        | cent AS (SELECT label, j,
        |   CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
        |     / CAST(COUNT(*) AS DOUBLE) AS c
        |  FROM x GROUP BY label, j),
        | pv AS (SELECT x.vec_id, x.label,
        |   SUM(CAST(round((x.v - cent.c) * (x.v - cent.c), 9)
        |     AS DECIMAL(18,9))) AS d2
        |  FROM x JOIN cent ON x.label = cent.label AND x.j = cent.j
        |  GROUP BY x.vec_id, x.label),
        | intra AS (SELECT label, COUNT(*) AS n_vecs,
        |   CAST(SUM(d2) AS DOUBLE) AS sd2 FROM pv GROUP BY label),
        | cd AS (SELECT a.label AS label, b.label AS other,
        |   SUM(CAST(round((a.c - b.c) * (a.c - b.c), 9)
        |     AS DECIMAL(18,9))) AS cd2
        |  FROM cent a JOIN cent b ON a.j = b.j AND a.label <> b.label
        |  GROUP BY a.label, b.label),
        | nearest AS (SELECT label, other, CAST(cd2 AS DOUBLE) AS inter_raw,
        |   ROW_NUMBER() OVER (PARTITION BY label
        |     ORDER BY cd2, other) AS rn FROM cd)
        |SELECT i.label, i.n_vecs,
        | ROUND(i.sd2 / CAST(i.n_vecs AS DOUBLE), 4) + 0.0 AS intra_msd,
        | n.other AS nearest_label,
        | ROUND(n.inter_raw, 4) + 0.0 AS inter_d2,
        | ROUND(n.inter_raw / (i.sd2 / CAST(i.n_vecs AS DOUBLE)), 4)
        |   + 0.0 AS sep
        |FROM intra i JOIN nearest n ON i.label = n.label AND n.rn = 1
        |ORDER BY i.label""".stripMargin,

    // r13: r11's recursive BFS with the seed tracked as a column —
    // MIN(dist) per (n, src) pair is the BFS distance; dist >= 1 drops
    // exactly the (seed, itself, 0) rows; all-integer harmonic h6
    "r13_harmonic" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem) a
        |  JOIN (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem) b
        |   ON a.ok = b.ok AND a.p < b.p),
        | und AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        | bfs(n, src, dist) AS (
        |  SELECT DISTINCT u AS n, u AS src, 0 AS dist FROM und WHERE u % 100 = 0
        |  UNION
        |  SELECT und.v AS n, bfs.src, bfs.dist + 1 AS dist
        |  FROM bfs JOIN und ON bfs.n = und.u WHERE bfs.dist < 3),
        | md AS (SELECT n, src, MIN(dist) AS dist FROM bfs GROUP BY n, src)
        |SELECT n AS p_partkey,
        | CAST(COUNT(CASE WHEN dist = 1 THEN 1 END) AS BIGINT) AS r1,
        | CAST(COUNT(CASE WHEN dist = 2 THEN 1 END) AS BIGINT) AS r2,
        | CAST(COUNT(CASE WHEN dist = 3 THEN 1 END) AS BIGINT) AS r3,
        | CAST(COUNT(CASE WHEN dist = 1 THEN 1 END) * 6
        |   + COUNT(CASE WHEN dist = 2 THEN 1 END) * 3
        |   + COUNT(CASE WHEN dist = 3 THEN 1 END) * 2 AS BIGINT) AS h6
        |FROM md WHERE dist >= 1 GROUP BY n ORDER BY p_partkey""".stripMargin,

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

    // x48: leading digit via exact integer cents (never stringify a
    // double); ln-of-integer parity for the Benford constant; the gap
    // subtracts the two ROUNDED doubles, then rounds once more
    "x48_benford" ->
      """WITH dig AS (SELECT CAST(substr(CAST(
        |     CAST(round(o_totalprice * 100.0) AS BIGINT) AS VARCHAR),
        |     1, 1) AS INTEGER) AS digit FROM orders),
        | per AS (SELECT digit, COUNT(*) AS cnt FROM dig GROUP BY digit),
        | tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM per),
        | sh AS (SELECT digit, cnt,
        |   ROUND(CAST(cnt AS DOUBLE) / CAST(n_total AS DOUBLE), 4)
        |     + 0.0 AS share,
        |   ROUND((ln(CAST(digit + 1 AS DOUBLE)) - ln(CAST(digit AS DOUBLE)))
        |     / ln(10.0), 4) + 0.0 AS benford
        |  FROM per, tot)
        |SELECT digit, cnt, share, benford,
        | ROUND(share - benford, 4) + 0.0 AS gap
        |FROM sh ORDER BY digit""".stripMargin,

    // x49: integer masses (bigint sums), one rounded double division per
    // fertility; x7's token-count conventions
    "x49_fertility" ->
      """WITH m AS (SELECT lang, source,
        |   CAST(length(text) AS BIGINT) AS chars,
        |   CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
        |   CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS BIGINT) AS bpe
        |  FROM documents)
        |SELECT lang, source, COUNT(*) AS docs,
        | CAST(SUM(chars) AS BIGINT) AS n_chars,
        | CAST(SUM(ws) AS BIGINT) AS ws_tokens,
        | CAST(SUM(bpe) AS BIGINT) AS bpe_pieces,
        | ROUND(CAST(SUM(chars) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE), 4)
        |   + 0.0 AS fert_ws,
        | ROUND(CAST(SUM(chars) AS DOUBLE) / CAST(SUM(bpe) AS DOUBLE), 4)
        |   + 0.0 AS fert_bpe
        |FROM m GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    // x50: ceil-division in integers ((wc + L-1) // L), one rounded double
    // division for the waste share; L = 2048 mirrors Pipeline.CtxLen
    "x50_pad_waste" ->
      """WITH m AS (SELECT source,
        |   CAST(len(string_split(text, ' ')) AS BIGINT) AS wc
        |  FROM documents),
        | per AS (SELECT source, COUNT(*) AS docs,
        |   CAST(SUM(wc) AS BIGINT) AS tokens,
        |   CAST(SUM((wc + 2047) // 2048) AS BIGINT) AS seqs
        |  FROM m GROUP BY source)
        |SELECT source, docs, tokens, seqs,
        | seqs * 2048 - tokens AS pad_tokens,
        | ROUND(CAST(seqs * 2048 - tokens AS DOUBLE)
        |   / CAST(seqs * 2048 AS DOUBLE), 4) + 0.0 AS waste
        |FROM per ORDER BY source""".stripMargin,

    // j20: the oracle states the PLAIN disjunctive predicate — the
    // union-of-hash-joins decomposition is a plan property, invisible
    // in the result; all counts integer
    "j20_or_join" ->
      """SELECT s_nationkey AS nationkey, COUNT(*) AS n_pairs,
        | CAST(COUNT(CASE WHEN s_nationkey = c_nationkey THEN 1 END)
        |   AS BIGINT) AS n_same_nation,
        | CAST(COUNT(CASE WHEN s_acctbal = c_acctbal THEN 1 END)
        |   AS BIGINT) AS n_same_bal
        |FROM supplier JOIN customer
        | ON s_nationkey = c_nationkey OR s_acctbal = c_acctbal
        |GROUP BY s_nationkey ORDER BY nationkey""".stripMargin,

    // r14: three peel rounds stated as three chained CTE rounds — the
    // identical bounded computation the Spark loop runs; all integer
    "r14_kcore" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
        |   FROM lineitem),
        | e0 AS (SELECT a.p AS u, b.p AS v FROM li a
        |   JOIN li b ON a.ok = b.ok AND a.p < b.p GROUP BY a.p, b.p),
        | u0 AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        | n1 AS (SELECT u AS n FROM u0 GROUP BY u HAVING COUNT(*) >= 3),
        | u1 AS (SELECT u0.u, u0.v FROM u0
        |   JOIN n1 a ON u0.u = a.n JOIN n1 b ON u0.v = b.n),
        | n2 AS (SELECT u AS n FROM u1 GROUP BY u HAVING COUNT(*) >= 3),
        | u2 AS (SELECT u1.u, u1.v FROM u1
        |   JOIN n2 a ON u1.u = a.n JOIN n2 b ON u1.v = b.n),
        | n3 AS (SELECT u AS n FROM u2 GROUP BY u HAVING COUNT(*) >= 3),
        | u3 AS (SELECT u2.u, u2.v FROM u2
        |   JOIN n3 a ON u2.u = a.n JOIN n3 b ON u2.v = b.n)
        |SELECT u AS p_partkey, CAST(COUNT(*) AS BIGINT) AS deg
        |FROM u3 GROUP BY u ORDER BY p_partkey""".stripMargin,

    // r15: the oracle states the NAIVE unoriented wedge count per edge
    // (fine single-node at toy SF) — the Spark side reaches the same
    // per-edge triangle counts through r9's oriented enumeration
    "r15_jaccard_links" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
        |   FROM lineitem),
        | e0 AS (SELECT a.p AS u, b.p AS v FROM li a
        |   JOIN li b ON a.ok = b.ok AND a.p < b.p GROUP BY a.p, b.p),
        | und AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        | deg AS (SELECT u AS n, CAST(COUNT(*) AS BIGINT) AS dg
        |   FROM und GROUP BY u),
        | cn AS (SELECT e0.u, e0.v, CAST(COUNT(*) AS BIGINT) AS cn
        |  FROM e0 JOIN und a ON a.u = e0.u JOIN und b
        |   ON b.u = e0.v AND b.v = a.v
        |  GROUP BY e0.u, e0.v)
        |SELECT cn.u, cn.v, cn.cn, du.dg AS du, dv.dg AS dv,
        | ROUND(CAST(cn.cn AS DOUBLE)
        |   / CAST(du.dg + dv.dg - cn.cn AS DOUBLE), 4) + 0.0 AS jac
        |FROM cn JOIN deg du ON cn.u = du.n JOIN deg dv ON cn.v = dv.n
        |ORDER BY cn.u, cn.v""".stripMargin,

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

    "f15_string3" ->
      """SELECT p_partkey, p_name,
        | lpad(p_name, 30, '.') AS padded,
        | rpad(p_name, 30, '*') AS rpadded,
        | translate(p_name, 'aeiou', 'AEIOU') AS shouted,
        | reverse(p_name) AS reversed,
        | repeat(substr(p_name, 1, 3), 2) AS echoed,
        | CAST(instr(p_name, 'a') AS BIGINT) AS first_a
        |FROM part ORDER BY p_partkey""".stripMargin,

    // x51: a17's OLS discipline on (ln rank, ln count) — 9-dp-rounded
    // DECIMAL(18,9) terms, exact moment sums, double closed form
    "x51_zipf_fit" ->
      """WITH cnt AS (SELECT unnest(string_split(text, ' ')) AS token
        |   FROM documents),
        | c AS (SELECT token, COUNT(*) AS cnt FROM cnt GROUP BY 1),
        | top AS (SELECT token, cnt FROM c
        |   ORDER BY cnt DESC, token LIMIT 100),
        | xy AS (SELECT
        |   CAST(ROUND(ln(CAST(ROW_NUMBER() OVER
        |       (ORDER BY cnt DESC, token) AS DOUBLE)), 9)
        |     AS DECIMAL(18,9)) AS x,
        |   CAST(ROUND(ln(CAST(cnt AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y
        |  FROM top),
        | g AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |   SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
        |  FROM xy),
        | m AS (SELECT n, CAST(n AS DOUBLE) AS nd,
        |   CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        |   CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd,
        |   CAST(sxy AS DOUBLE) AS sxyd FROM g)
        |SELECT n AS n_terms,
        | ROUND((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd), 4)
        |   + 0.0 AS slope,
        | ROUND((syd - ((nd * sxyd - sxd * syd)
        |     / (nd * sxxd - sxd * sxd)) * sxd) / nd, 4) + 0.0 AS intercept,
        | ROUND(((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd))
        |   / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)), 4)
        |   + 0.0 AS r2
        |FROM m ORDER BY n_terms""".stripMargin,

    // x52: generate_subscripts is DuckDB's 1-based UNNEST WITH ORDINALITY
    // (zips with the unnest of the same list) ≡ Spark posexplode + 1
    "x52_first_position" ->
      """WITH tok AS (SELECT doc_id,
        |   unnest(string_split(text, ' ')) AS token,
        |   generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents),
        | f AS (SELECT doc_id, token, MIN(pos) AS fp FROM tok GROUP BY 1, 2),
        | t AS (SELECT token, COUNT(*) AS df, CAST(SUM(fp) AS BIGINT) AS sfp
        |   FROM f GROUP BY 1 ORDER BY df DESC, token LIMIT 20)
        |SELECT token, df,
        | ROUND(CAST(sfp AS DOUBLE) / CAST(df AS DOUBLE), 4) + 0.0
        |   AS avg_first_pos
        |FROM t ORDER BY df DESC, token""".stripMargin,

    // x53: exact-integer Gini — the only float op is the final stated
    // double expression
    "x53_source_gini" ->
      """WITH m AS (SELECT source,
        |   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS mass
        |  FROM documents GROUP BY 1),
        | r AS (SELECT mass,
        |   CAST(ROW_NUMBER() OVER (ORDER BY mass, source) AS BIGINT) AS i
        |  FROM m),
        | g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
        |   CAST(SUM(mass) AS BIGINT) AS total_tokens,
        |   CAST(SUM(i * mass) AS BIGINT) AS wsum FROM r)
        |SELECT n_sources, total_tokens,
        | ROUND((2.0 * CAST(wsum AS DOUBLE)
        |    - CAST(n_sources + 1 AS DOUBLE) * CAST(total_tokens AS DOUBLE))
        |  / (CAST(n_sources AS DOUBLE) * CAST(total_tokens AS DOUBLE)), 4)
        |   + 0.0 AS gini
        |FROM g ORDER BY n_sources""".stripMargin,

    // w11: the oracle states the same plain window idiom — the heap
    // rewrite is a plan property, invisible in the result
    "w11_topk_plain" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t
        |WHERE rn <= 2 ORDER BY o_custkey, o_orderkey""".stripMargin,

    // j21: IS NOT DISTINCT FROM ≡ Spark <=>; null class surfaced as -1
    "j21_nullsafe" ->
      """WITH s AS (SELECT s_suppkey, nullif(s_nationkey, 24) AS sk
        |   FROM supplier),
        | c AS (SELECT c_custkey, nullif(c_nationkey, 24) AS ck
        |   FROM customer)
        |SELECT COALESCE(sk, -1) AS k, COUNT(*) AS n_pairs,
        | CAST(COUNT(CASE WHEN sk IS NULL THEN 1 END) AS BIGINT)
        |   AS n_null_pairs
        |FROM s JOIN c ON sk IS NOT DISTINCT FROM ck
        |GROUP BY 1 ORDER BY k""".stripMargin,

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

    // x54: x6's quality quantized DECIMAL(9,4) (4-dp exact), wc moments
    // exact, a17's double closed form for slope/r²
    "x54_length_bias" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
        |   FROM documents),
        | c AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS wc,
        |  CAST(len(list_filter(w, t -> list_contains(['the','a','of','and'], t))) AS INTEGER) AS stop_cnt,
        |  CAST(len(list_filter(w, t -> length(t) <= 2)) AS INTEGER) AS short_cnt
        |  FROM w),
        | q AS (SELECT wc, CAST(ROUND(1.0
        |    - 0.5 * (CAST(stop_cnt AS DOUBLE) / wc)
        |    - 0.3 * (CAST(short_cnt AS DOUBLE) / wc), 4) + 0.0
        |   AS DECIMAL(9,4)) AS qd FROM c),
        | b AS (SELECT wc // 10 AS wc_bucket, COUNT(*) AS docs,
        |   ROUND(CAST(SUM(qd) AS DOUBLE) / COUNT(*), 4) + 0.0 AS avg_quality
        |  FROM q GROUP BY 1),
        | g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
        |   CAST(SUM(wc) AS DOUBLE) AS sxd, CAST(SUM(qd) AS DOUBLE) AS syd,
        |   CAST(SUM(wc * wc) AS DOUBLE) AS sxxd,
        |   CAST(SUM(qd * qd) AS DOUBLE) AS syyd,
        |   CAST(SUM(wc * qd) AS DOUBLE) AS sxyd FROM q),
        | st AS (SELECT
        |   ROUND((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd), 4)
        |     + 0.0 AS lb_slope,
        |   ROUND(((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd))
        |     / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)), 4)
        |     + 0.0 AS lb_r2 FROM g)
        |SELECT wc_bucket, docs, avg_quality, lb_slope, lb_r2
        |FROM b, st ORDER BY wc_bucket""".stripMargin,

    // x55: octave = bitlength(df) − 1 (exact base-2 string idiom, x35's)
    "x55_shingle_df" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
        |   FROM documents WHERE len(string_split(text, ' ')) >= 3),
        | sh AS (SELECT DISTINCT doc_id,
        |   unnest(list_transform(range(1, len(w) - 1),
        |     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |  FROM w),
        | df AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY 1)
        |SELECT CAST(length(bin(df)) AS INT) - 1 AS df_bucket,
        | COUNT(*) AS n_shingles, CAST(SUM(df) AS BIGINT) AS postings
        |FROM df GROUP BY 1 ORDER BY df_bucket""".stripMargin,

    // r16: exact integer/decimal moments, one double closed form (sqrt is
    // IEEE correctly rounded on both engines)
    "r16_assortativity" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
        |   FROM lineitem),
        | e0 AS (SELECT a.p AS u, b.p AS v FROM li a
        |   JOIN li b ON a.ok = b.ok AND a.p < b.p GROUP BY a.p, b.p),
        | und AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        | deg AS (SELECT u AS n, CAST(COUNT(*) AS BIGINT) AS dg
        |   FROM und GROUP BY u),
        | ends AS (SELECT du.dg AS du, dv.dg AS dv FROM und
        |   JOIN deg du ON und.u = du.n JOIN deg dv ON und.v = dv.n),
        | g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |   CAST(SUM(du) AS BIGINT) AS sx, CAST(SUM(dv) AS BIGINT) AS sy,
        |   SUM(CAST(du * du AS DECIMAL(38,0))) AS sxx,
        |   SUM(CAST(dv * dv AS DECIMAL(38,0))) AS syy,
        |   SUM(CAST(du * dv AS DECIMAL(38,0))) AS sxy FROM ends)
        |SELECT n AS n_ends,
        | ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 4) + 0.0
        |   AS avg_end_degree,
        | ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4) + 0.0
        |   AS assortativity
        |FROM g ORDER BY n_ends""".stripMargin,

    // x56: l1's md5 identity + corpus-wide min-doc_id survivor; share is
    // one exact-long double division
    "x56_dup_inflation" ->
      """WITH d AS (SELECT doc_id, source,
        |   CAST(len(string_split(text, ' ')) AS BIGINT) AS wc,
        |   md5(lower(trim(text))) AS h
        |  FROM documents),
        | s AS (SELECT h, MIN(doc_id) AS survivor_id FROM d GROUP BY h)
        |SELECT source, COUNT(*) AS docs, CAST(SUM(wc) AS BIGINT) AS tokens,
        | CAST(COUNT(CASE WHEN doc_id <> survivor_id THEN 1 END) AS BIGINT)
        |   AS dup_docs,
        | CAST(SUM(CASE WHEN doc_id <> survivor_id THEN wc ELSE 0 END)
        |   AS BIGINT) AS dup_tokens,
        | ROUND(CAST(SUM(CASE WHEN doc_id <> survivor_id THEN wc ELSE 0 END)
        |     AS DOUBLE)
        |   / CAST(SUM(wc) AS DOUBLE), 4) + 0.0 AS dup_share
        |FROM d JOIN s USING (h)
        |GROUP BY source ORDER BY source""".stripMargin,

    // m-group: the media table is a deterministic derivation of documents
    // (kind = doc_id mod 3 over image/audio/video, blob = encode(text)),
    // so blob statistics restate as octet_length/md5 over the text column
    // (md5(VARCHAR) hashes the UTF-8 bytes = the Spark side's blob md5)
    "m1_media_rollup" ->
      """WITH m AS (SELECT doc_id,
        |   CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |   octet_length(encode(text)) AS byte_len,
        |   md5(text) AS sig
        |  FROM documents)
        |SELECT kind, CAST(COUNT(*) AS BIGINT) AS items,
        | CAST(SUM(byte_len) AS BIGINT) AS total_bytes,
        | CAST(COUNT(DISTINCT sig) AS BIGINT) AS n_sigs,
        | CAST(MIN(byte_len) AS INT) AS min_bytes,
        | CAST(MAX(byte_len) AS INT) AS max_bytes
        |FROM m GROUP BY kind ORDER BY kind""".stripMargin,

    // m2: 64-byte frame slicing is pure integer arithmetic on the blob
    // length; video kind = doc_id mod 3 = 2
    "m2_frame_sample" ->
      """SELECT doc_id,
        | CAST((octet_length(encode(text)) + 63) // 64 AS BIGINT) AS n_frames,
        | CAST(octet_length(encode(text)) AS BIGINT) AS total_bytes,
        | CAST(((octet_length(encode(text)) - 1) % 64) + 1 AS INT)
        |   AS last_frame_bytes
        |FROM documents WHERE doc_id % 3 = 2 ORDER BY doc_id""".stripMargin,

    // m3: the fixture payload is pure ASCII (FixtureContractSpec), so the
    // first 64 CHARS the VARCHAR functions see are the first 64 BYTES the
    // Spark side slices from the blob
    "m3_media_prefix" ->
      """WITH p AS (SELECT doc_id,
        |   CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |   md5(substring(text, 1, 64)) AS prefix_sig,
        |   md5(text) AS full_sig
        |  FROM documents)
        |SELECT prefix_sig, CAST(COUNT(*) AS BIGINT) AS n_docs,
        | CAST(COUNT(DISTINCT full_sig) AS BIGINT) AS n_variants,
        | CAST(COUNT(DISTINCT kind) AS BIGINT) AS n_kinds,
        | MIN(doc_id) AS first_doc
        |FROM p GROUP BY prefix_sig HAVING COUNT(*) >= 2
        |ORDER BY prefix_sig""".stripMargin,

    // m4: share window over the aggregated (kind, lang) cells — DuckDB
    // window SUM(BIGINT) is HUGEINT, cast before the double division (D9)
    "m4_media_mix" ->
      """WITH m AS (SELECT doc_id, lang,
        |   CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |   octet_length(encode(text)) AS bl
        |  FROM documents),
        | cell AS (SELECT kind, lang, COUNT(*) AS items,
        |   CAST(SUM(bl) AS BIGINT) AS total_bytes
        |  FROM m GROUP BY 1, 2)
        |SELECT kind, lang, items, total_bytes,
        | ROUND(CAST(total_bytes AS DOUBLE)
        |   / CAST(CAST(SUM(total_bytes) OVER (PARTITION BY kind) AS BIGINT)
        |       AS DOUBLE), 4) + 0.0 AS byte_share
        |FROM cell ORDER BY kind, lang""".stripMargin,

    // f17: DuckDB length() is BIGINT where Spark's is INT — CAST every
    // list-derived scalar to the Spark output type
    "f17_higher_order" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
        |  FROM documents)
        |SELECT doc_id, CAST(len(tk) AS INT) AS n_toks,
        | CAST(list_max(list_transform(tk, x -> length(x))) AS INT)
        |   AS max_len,
        | CAST(list_sum(list_transform(tk, x -> length(x))) AS BIGINT)
        |   AS char_mass,
        | len(list_filter(tk, x -> length(x) > 6)) > 0 AS has_long,
        | len(list_filter(tk, x -> length(x) >= 8)) = 0 AS all_short,
        | CAST(len(list_filter(tk, x -> length(x) >= 6)) AS INT) AS n_ge6
        |FROM t ORDER BY doc_id""".stripMargin,

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

    "j22_exists_flags" ->
      """WITH fl AS (SELECT l_orderkey,
        |   MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_ret,
        |   MAX(CASE WHEN l_quantity >= 45 THEN 1 ELSE 0 END) AS has_big
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT o_orderpriority, COUNT(*) AS n_orders,
        | CAST(SUM(COALESCE(has_ret, 0)) AS BIGINT) AS n_with_return,
        | CAST(SUM(COALESCE(has_big, 0)) AS BIGINT) AS n_with_big,
        | CAST(SUM(CASE WHEN has_ret = 1 AND has_big = 1 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_with_both
        |FROM orders LEFT JOIN fl ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // u9: output columns are raw copies of the winning row, so the oracle
    // is the same argmax stated as ROW_NUMBER() = 1 (ties: value desc,
    // ts asc, event_id asc — D6 total order)
    "u9_typed_argmax" ->
      """WITH r AS (SELECT user_id, event_id, event_type, value,
        |   ROW_NUMBER() OVER (PARTITION BY user_id
        |     ORDER BY value DESC, ts, event_id) AS rn
        |  FROM events)
        |SELECT user_id, event_id AS top_event_id, event_type AS top_type,
        | value AS top_value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // x60: x58's suffix mirror — tk[greatest(1, len-2):] is the last-3
    // slice `slice(toks, greatest(1, size-2), 3)` states on the Spark side
    "x60_suffix_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk,
        |   md5(lower(trim(text))) AS fh FROM documents),
        | g AS (SELECT
        |   md5(array_to_string(tk[greatest(1, len(tk) - 2):], ' '))
        |     AS suffix_hash,
        |   MIN(doc_id) AS survivor_id, COUNT(*) AS n_docs,
        |   CAST(COUNT(DISTINCT fh) AS BIGINT) AS n_full_variants
        |  FROM t GROUP BY 1)
        |SELECT survivor_id, suffix_hash, n_docs, n_full_variants
        |FROM g WHERE n_docs >= 2 ORDER BY survivor_id""".stripMargin,

    // m5: aligned 64-byte chunk dedup — the paired-unnest idiom (x29)
    // states Spark's byte chunking; fixture payload is pure ASCII so the
    // VARCHAR substring sees exactly the blob's byte slices, and the tail
    // chunk's length is least(64, bytes - i*64)
    "m5_media_chunks" ->
      """WITH ch AS (SELECT doc_id,
        |   CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |   unnest(list_transform(
        |     range(CAST((octet_length(encode(text)) - 1) // 64 AS INT) + 1),
        |     i -> md5(substring(text, CAST(i * 64 + 1 AS INT), 64))))
        |     AS chunk_sig,
        |   unnest(list_transform(
        |     range(CAST((octet_length(encode(text)) - 1) // 64 AS INT) + 1),
        |     i -> CAST(least(64, octet_length(encode(text)) - i * 64) AS INT)))
        |     AS byte_len
        |  FROM documents)
        |SELECT chunk_sig, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        | COUNT(*) AS n_occ, CAST(COUNT(DISTINCT kind) AS BIGINT) AS n_kinds,
        | MIN(doc_id) AS first_doc, CAST(MIN(byte_len) AS INT) AS chunk_bytes,
        | CAST((COUNT(*) - 1) * MIN(byte_len) AS BIGINT) AS dup_bytes
        |FROM ch GROUP BY chunk_sig
        |HAVING COUNT(DISTINCT doc_id) >= 2 ORDER BY chunk_sig""".stripMargin,

    // u10: the typed flatMapGroups gap emission is the LAG window + filter
    // in SQL; equal-ts neighbours gap 0 and never pass, so the pair set is
    // order-total (D6)
    "u10_flatmap_gaps" ->
      """WITH g AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |   LAG(epoch_us(ts)) OVER (PARTITION BY user_id
        |     ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events)
        |SELECT user_id, prev_us AS gap_start_us, ts_us AS gap_end_us,
        | ts_us - prev_us AS gap_us
        |FROM g WHERE ts_us - prev_us > 3600 * 1000000::BIGINT
        |ORDER BY user_id, gap_start_us""".stripMargin,

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

    // f18: format_string ≡ printf (same C conversion spec for %d/%s); the
    // money label goes DECIMAL(18,2) → VARCHAR on both sides, never %f on
    // a double (C printf half-even vs Java HALF_UP tie divergence)
    "f18_format" ->
      """SELECT o_orderkey,
        | printf('ORD-%09d', o_orderkey) AS order_tag,
        | '$' || lpad(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
        |     12, ' ') AS price_label,
        | printf('%s|%s', o_orderstatus, o_orderpriority) AS status_key,
        | lpad(CAST(o_custkey AS VARCHAR), 10, '0') AS cust_pad,
        | rpad(o_orderstatus, 3, '.') AS status_pad
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // x61: the md5 sample key hashes the doc id's DECIMAL STRING — both
    // engines render a bigint identically, so the pick order is portable
    "x61_stratified_sample" ->
      """WITH h AS (SELECT source, doc_id, lang,
        |   md5(CAST(doc_id AS VARCHAR)) AS pick_hash FROM documents),
        | r AS (SELECT source, doc_id, lang, pick_hash,
        |   ROW_NUMBER() OVER (PARTITION BY source
        |     ORDER BY pick_hash, doc_id) AS rk
        |  FROM h)
        |SELECT source, CAST(rk AS INT) AS rk, doc_id, lang, pick_hash
        |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin,

    // x62: one aggregation states every stat; min/max rendered as VARCHAR
    // (BIGINT renders identically on both engines)
    "x62_profile_card" ->
      """WITH g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS lang_nulls,
        |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS lang_distinct,
        |  MIN(lang) AS lang_min, MAX(lang) AS lang_max,
        |  CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS source_nulls,
        |  CAST(COUNT(DISTINCT source) AS BIGINT) AS source_distinct,
        |  MIN(source) AS source_min, MAX(source) AS source_max,
        |  CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS nc_nulls,
        |  CAST(COUNT(DISTINCT n_chars) AS BIGINT) AS nc_distinct,
        |  CAST(MIN(n_chars) AS VARCHAR) AS nc_min,
        |  CAST(MAX(n_chars) AS VARCHAR) AS nc_max
        | FROM documents)
        |SELECT 'lang' AS column_name, n_rows, lang_nulls AS n_nulls,
        |  lang_distinct AS n_distinct, lang_min AS min_repr,
        |  lang_max AS max_repr FROM g
        |UNION ALL
        |SELECT 'n_chars', n_rows, nc_nulls, nc_distinct, nc_min, nc_max
        | FROM g
        |UNION ALL
        |SELECT 'source', n_rows, source_nulls, source_distinct, source_min,
        |  source_max FROM g
        |ORDER BY column_name""".stripMargin,

    // r18: component SET is label-scheme-invariant (r9's argument); the
    // recursive reach states min-label directly. Support >= 2 prunes the
    // raw co-purchase graph (which is one giant component) to the
    // frequent-itemset subgraph the recursive CTE can enumerate
    "r18_components" ->
      """WITH RECURSIVE li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
        | prs AS (SELECT a.p AS u, b.p AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        | edges AS (SELECT u AS src, v AS dst FROM prs
        |  UNION ALL SELECT v, u FROM prs),
        | nodes AS (SELECT DISTINCT src AS n FROM edges),
        | reach(root, node) AS (
        |  SELECT n, n FROM nodes
        |  UNION
        |  SELECT r.root, e.dst FROM reach r JOIN edges e ON r.node = e.src),
        | comp AS (SELECT root AS p_partkey, MIN(node) AS component
        |  FROM reach GROUP BY root),
        | sz AS (SELECT component, COUNT(*) AS comp_size FROM comp GROUP BY 1)
        |SELECT p_partkey, component, CAST(comp_size AS BIGINT) AS comp_size
        |FROM comp JOIN sz USING (component) ORDER BY p_partkey""".stripMargin,

    // m6: percentile_disc SELECTS an input byte length (no interpolation);
    // the mean is l5's double-division-of-integer-sums discipline
    "m6_size_profile" ->
      """WITH f AS (SELECT doc_id,
        |   CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |   octet_length(encode(text)) AS byte_len
        |  FROM documents)
        |SELECT kind, COUNT(*) AS items,
        | CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY byte_len) AS INT)
        |   AS p25_bytes,
        | CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY byte_len) AS INT)
        |   AS p50_bytes,
        | CAST(percentile_disc(0.90) WITHIN GROUP (ORDER BY byte_len) AS INT)
        |   AS p90_bytes,
        | ROUND(CAST(SUM(byte_len) AS DOUBLE) / COUNT(*), 4) AS mean_bytes
        |FROM f GROUP BY kind ORDER BY kind""".stripMargin,

    // f19: the oracle states each component DIRECTLY from the source
    // columns (m1's discipline — the check is that Spark's parse_url
    // returns the constructed truth, not a SQL re-parse)
    "f19_url_parse" ->
      """SELECT doc_id,
        | 'https://' || source || '.example.com/docs/' || lang || '/' ||
        |   doc_id || '?lang=' || lang || '&chars=' || n_chars AS url,
        | 'https' AS proto,
        | source || '.example.com' AS host,
        | '/docs/' || lang || '/' || doc_id AS path,
        | 'lang=' || lang || '&chars=' || n_chars AS query,
        | CAST(n_chars AS VARCHAR) AS chars_param
        |FROM documents ORDER BY doc_id""".stripMargin,

    // u11: the typed cogroup is the left-join+agg in SQL; money sums are
    // exact DECIMAL(18,2), delta stated from the same quantities
    "u11_cogroup_recon" ->
      """SELECT o_orderkey,
        | CAST(COUNT(l_orderkey) AS BIGINT) AS n_items,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_total,
        | CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,2))),
        |   CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS li_gross,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |   - COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,2))),
        |     CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS delta
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey, o_totalprice ORDER BY o_orderkey""".stripMargin,

    // l10: x5's classifier CTEs + one (actual, pred) rollup; the row share
    // is a window over the <= 25 aggregated cells
    "l10_lang_confusion" ->
      """WITH t AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks FROM documents),
        | sc AS (SELECT doc_id, lang,
        |  len(list_intersect(toks, ['the','a','fast','slow','big','small'])) AS s_en,
        |  len(list_intersect(toks, ['der','die','das','und','schnell'])) AS s_de,
        |  len(list_intersect(toks, ['el','la','los','rapido','lento'])) AS s_es,
        |  len(list_intersect(toks, ['le','les','vite','grand','petit'])) AS s_fr,
        |  len(list_intersect(toks, ['de','shi','kuai','man','da'])) AS s_zh
        |  FROM t),
        | pred AS (SELECT doc_id, lang AS actual_lang,
        |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |       WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |       WHEN s_es >= s_en AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |       WHEN s_fr >= s_en AND s_fr >= s_de AND s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
        |       ELSE 'zh' END AS pred_lang
        |  FROM sc),
        | cell AS (SELECT actual_lang, pred_lang, COUNT(*) AS n_docs
        |  FROM pred GROUP BY 1, 2)
        |SELECT actual_lang, pred_lang, n_docs,
        | ROUND(CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs)
        |   OVER (PARTITION BY actual_lang) AS DOUBLE), 4) AS row_share
        |FROM cell ORDER BY actual_lang, pred_lang""".stripMargin,

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

    // x63: x1's signature/band CTEs, then bucket sizes -> size histogram;
    // pair mass in exact integer floor-div (even product)
    "x63_band_occupancy" -> (x1Ctes +
      """,
        | buck AS (SELECT pos AS band, lang, bh, COUNT(*) AS sz
        |  FROM bands GROUP BY 1, 2, 3)
        |SELECT band, sz AS bucket_size, COUNT(*) AS n_buckets,
        | CAST(SUM(sz) AS BIGINT) AS n_docs,
        | CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS cand_pairs
        |FROM buck GROUP BY band, sz ORDER BY band, bucket_size""".stripMargin),

    // x64: boundary flag from md5(token) hex prefix; chunk id = running sum
    // of PRIOR boundaries per doc; parallel unnests zip positionally
    "x64_cdc_chunks" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | t AS (SELECT doc_id,
        |   CAST(unnest(range(len(w))) AS INT) AS pos, unnest(w) AS tok
        |  FROM w),
        | b AS (SELECT doc_id, pos, tok,
        |   CASE WHEN substr(md5(tok), 1, 1) IN ('0','1','2','3')
        |    THEN 1 ELSE 0 END AS brk
        |  FROM t),
        | c AS (SELECT doc_id, pos, tok,
        |   COALESCE(SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
        |  FROM b),
        | g AS (SELECT doc_id, cid, COUNT(*) AS n_toks,
        |   string_agg(tok, ' ' ORDER BY pos) AS chunk
        |  FROM c GROUP BY doc_id, cid)
        |SELECT md5(chunk) AS chunk_sig,
        | CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        | COUNT(*) AS n_occ, MIN(n_toks) AS n_toks,
        | MIN(doc_id) AS first_doc,
        | CAST((COUNT(*) - 1) * MIN(n_toks) AS BIGINT) AS dup_tokens
        |FROM g GROUP BY md5(chunk)
        |HAVING COUNT(DISTINCT doc_id) >= 2 ORDER BY chunk_sig""".stripMargin,

    // r19: r16's end-pair CTEs, one degree-keyed rollup; mean = double
    // division of exact BIGINT sums (l5's discipline)
    "r19_neighbor_degree" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
        |  FROM lineitem),
        | prs AS (SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
        | und AS (SELECT u, v FROM prs UNION ALL SELECT v, u FROM prs),
        | deg AS (SELECT u AS n, COUNT(*) AS dg FROM und GROUP BY u),
        | ends AS (SELECT e.u, du.dg AS du, dv.dg AS dv
        |  FROM und e JOIN deg du ON e.u = du.n JOIN deg dv ON e.v = dv.n)
        |SELECT du AS degree, CAST(COUNT(DISTINCT u) AS BIGINT) AS n_nodes,
        | COUNT(*) AS n_ends,
        | ROUND(CAST(SUM(dv) AS DOUBLE) / COUNT(*), 4) AS avg_neighbor_degree
        |FROM ends GROUP BY du ORDER BY degree""".stripMargin,

    // x65: x6's quality terms in exact integer band math (x59's bucketing
    // discipline) x l1's md5 dup identity
    "x65_quality_dup_lift" ->
      """WITH sc AS (SELECT doc_id, md5(lower(trim(text))) AS text_hash,
        |   CAST(len(string_split(text, ' ')) AS BIGINT) AS wc,
        |   CAST(len(list_filter(string_split(text, ' '),
        |     t -> t IN ('the','a','of','and'))) AS BIGINT) AS stop_cnt,
        |   CAST(len(list_filter(string_split(text, ' '),
        |     t -> length(t) <= 2)) AS BIGINT) AS short_cnt
        |  FROM documents),
        | b AS (SELECT doc_id, text_hash,
        |   ((1000 * wc - 500 * stop_cnt - 300 * short_cnt) // wc) // 100
        |     AS band
        |  FROM sc),
        | dups AS (SELECT text_hash, COUNT(*) AS grp_sz FROM b
        |  GROUP BY text_hash)
        |SELECT band, COUNT(*) AS n_docs,
        | CAST(SUM(CASE WHEN grp_sz >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS dup_docs,
        | ROUND(CAST(SUM(CASE WHEN grp_sz >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |   / COUNT(*), 4) AS dup_share
        |FROM b JOIN dups USING (text_hash)
        |GROUP BY band ORDER BY band""".stripMargin,

    // x66: x1's sig CTE re-banded three ways; pair mass in exact integer
    // floor-div (even product)
    "x66_band_whatif" ->
      """WITH toks AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS t FROM documents),
        | sig AS (SELECT doc_id, lang,
        |  list_aggregate(list_transform(t, x -> md5('0:' || x)), 'min') AS mh0,
        |  list_aggregate(list_transform(t, x -> md5('1:' || x)), 'min') AS mh1,
        |  list_aggregate(list_transform(t, x -> md5('2:' || x)), 'min') AS mh2,
        |  list_aggregate(list_transform(t, x -> md5('3:' || x)), 'min') AS mh3,
        |  list_aggregate(list_transform(t, x -> md5('4:' || x)), 'min') AS mh4,
        |  list_aggregate(list_transform(t, x -> md5('5:' || x)), 'min') AS mh5,
        |  list_aggregate(list_transform(t, x -> md5('6:' || x)), 'min') AS mh6,
        |  list_aggregate(list_transform(t, x -> md5('7:' || x)), 'min') AS mh7
        |  FROM toks),
        | bands AS (
        |  SELECT '8x1' AS config, 0 AS pos, lang, mh0 AS bh FROM sig
        |  UNION ALL SELECT '8x1', 1, lang, mh1 FROM sig
        |  UNION ALL SELECT '8x1', 2, lang, mh2 FROM sig
        |  UNION ALL SELECT '8x1', 3, lang, mh3 FROM sig
        |  UNION ALL SELECT '8x1', 4, lang, mh4 FROM sig
        |  UNION ALL SELECT '8x1', 5, lang, mh5 FROM sig
        |  UNION ALL SELECT '8x1', 6, lang, mh6 FROM sig
        |  UNION ALL SELECT '8x1', 7, lang, mh7 FROM sig
        |  UNION ALL SELECT '4x2', 0, lang, md5(mh0 || mh1) FROM sig
        |  UNION ALL SELECT '4x2', 1, lang, md5(mh2 || mh3) FROM sig
        |  UNION ALL SELECT '4x2', 2, lang, md5(mh4 || mh5) FROM sig
        |  UNION ALL SELECT '4x2', 3, lang, md5(mh6 || mh7) FROM sig
        |  UNION ALL SELECT '2x4', 0, lang, md5(mh0 || mh1 || mh2 || mh3) FROM sig
        |  UNION ALL SELECT '2x4', 1, lang, md5(mh4 || mh5 || mh6 || mh7) FROM sig),
        | buck AS (SELECT config, pos, lang, bh, COUNT(*) AS sz
        |  FROM bands GROUP BY 1, 2, 3, 4)
        |SELECT config, COUNT(*) AS n_buckets,
        | CAST(SUM(CASE WHEN sz >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS hot_buckets,
        | CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS cand_pairs
        |FROM buck GROUP BY config ORDER BY config""".stripMargin,

    // f20: DuckDB NULLs division-by-zero and TRY_CASTs natively — the same
    // null-on-error contract as Spark's try_* family; float strings are
    // avoided (DuckDB TRY_CAST('17.0' AS INT) rounds, Spark rejects)
    "f20_try_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        | ROUND(l_extendedprice / nullif(l_discount, 0), 4) + 0.0
        |   AS px_per_disc,
        | TRY_CAST(CASE WHEN l_orderkey % 1000 = 0 THEN l_returnflag
        |   ELSE CAST(l_linenumber AS VARCHAR) END AS INT) AS line_num,
        | TRY_CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS ok_rt,
        | string_split(l_returnflag || '-' || l_linestatus, '-')[2]
        |   AS status_part,
        | string_split(l_returnflag || '-' || l_linestatus, '-')[5]
        |   AS beyond_end
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, px_per_disc""".stripMargin,

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

    // u12: the typed pair join is the plain equi join in SQL
    "u12_typed_joinwith" ->
      """SELECT o_orderkey, c_name,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin
  )
}
