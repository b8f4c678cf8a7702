package graft.oracle

/** DuckDB oracle SQL — the join surface (j): one slice of [[OracleSql.sql]]
  * (round-13 split of the single 3.4k-line string table; every string
  * is unchanged — the driver hash gate is the no-drift proof).
  */
private[oracle] object OracleSqlJoins {

  val sql: Map[String, String] = Map(


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


    // j13: the salting is a PLAN property — the oracle states the plain
    // equi-join the salted result must equal
    "j13_salted_skew" ->
      """SELECT s_nationkey, COUNT(*) AS line_cnt,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,


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


    "j17_bloom_semi" ->
      """SELECT s_suppkey, s_name, COUNT(*) AS n_items,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |   AS DECIMAL(18,2)) AS DOUBLE) AS revenue
        |FROM lineitem
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_nationkey < 5
        |GROUP BY 1, 2 ORDER BY s_suppkey""".stripMargin,


    "j18_not_exists" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,


    // j19: the oracle states the PLAIN band predicate — the bucketed
    // equi-join rewrite is a plan property, invisible in the result
    "j19_band_bucket" ->
      """SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal,
        | ROUND(abs(s_acctbal - c_acctbal), 4) + 0.0 AS bal_diff
        |FROM supplier, customer
        |WHERE abs(s_acctbal - c_acctbal) <= 25.0
        |ORDER BY s_suppkey, c_custkey""".stripMargin,


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
  )
}
