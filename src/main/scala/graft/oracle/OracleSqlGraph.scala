package graft.oracle

/** DuckDB oracle SQL — the RDF-view / graph queries (r): one slice of [[OracleSql.sql]]
  * (round-13 split of the single 3.4k-line string table; every string
  * is unchanged — the driver hash gate is the no-drift proof).
  */
private[oracle] object OracleSqlGraph {

  val sql: Map[String, String] = Map(


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

    // r20: the degree orientation is a PLAN property (r9's argument) —
    // the oracle states plain partkey-ordered triangles and a NOT EXISTS
    // anti join against the normalized triangle-edge set
    "r20_local_bridges" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
        |   FROM lineitem),
        | e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |   FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
        | tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |   FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
        |   JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
        | te AS (SELECT a AS u, b AS v FROM tri
        |   UNION ALL SELECT a, c FROM tri UNION ALL SELECT b, c FROM tri),
        | br AS (SELECT u, v FROM e WHERE NOT EXISTS
        |   (SELECT 1 FROM te WHERE te.u = e.u AND te.v = e.v)),
        | deg AS (SELECT p, COUNT(*) AS dg FROM
        |   (SELECT u AS p FROM e UNION ALL SELECT v AS p FROM e) b GROUP BY p),
        | nb AS (SELECT p, COUNT(*) AS n_bridges FROM
        |   (SELECT u AS p FROM br UNION ALL SELECT v AS p FROM br) x GROUP BY p)
        |SELECT nb.p AS p_partkey, deg.dg AS deg, nb.n_bridges
        |FROM nb JOIN deg ON nb.p = deg.p ORDER BY p_partkey""".stripMargin,

    // r21: Rdf.TrussPeels = 2 peel rounds unrolled; each round recounts
    // triangle support INSIDE the surviving edge set (the cascade a
    // one-shot filter misses); orientation is a PLAN property (r9)
    "r21_truss" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
        |   FROM lineitem),
        | e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
        |   FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
        | t0 AS (SELECT ea.u AS a, ea.v AS b, eb.v AS c
        |   FROM e0 ea JOIN e0 eb ON ea.u = eb.u AND ea.v < eb.v
        |   JOIN e0 ec ON ec.u = ea.v AND ec.v = eb.v),
        | s0 AS (SELECT u, v, COUNT(*) AS sup FROM (
        |   SELECT a AS u, b AS v FROM t0 UNION ALL SELECT a, c FROM t0
        |   UNION ALL SELECT b, c FROM t0) x GROUP BY u, v),
        | p1 AS (SELECT e0.u, e0.v FROM e0
        |   JOIN s0 ON e0.u = s0.u AND e0.v = s0.v AND s0.sup >= 2),
        | t1 AS (SELECT ea.u AS a, ea.v AS b, eb.v AS c
        |   FROM p1 ea JOIN p1 eb ON ea.u = eb.u AND ea.v < eb.v
        |   JOIN p1 ec ON ec.u = ea.v AND ec.v = eb.v),
        | s1 AS (SELECT u, v, COUNT(*) AS sup FROM (
        |   SELECT a AS u, b AS v FROM t1 UNION ALL SELECT a, c FROM t1
        |   UNION ALL SELECT b, c FROM t1) x GROUP BY u, v),
        | p2 AS (SELECT p1.u, p1.v FROM p1
        |   JOIN s1 ON p1.u = s1.u AND p1.v = s1.v AND s1.sup >= 2),
        | t2 AS (SELECT ea.u AS a, ea.v AS b, eb.v AS c
        |   FROM p2 ea JOIN p2 eb ON ea.u = eb.u AND ea.v < eb.v
        |   JOIN p2 ec ON ec.u = ea.v AND ec.v = eb.v),
        | s2 AS (SELECT u, v, COUNT(*) AS sup FROM (
        |   SELECT a AS u, b AS v FROM t2 UNION ALL SELECT a, c FROM t2
        |   UNION ALL SELECT b, c FROM t2) x GROUP BY u, v)
        |SELECT p2.u, p2.v, CAST(COALESCE(s2.sup, 0) AS BIGINT) AS support
        |FROM p2 LEFT JOIN s2 ON p2.u = s2.u AND p2.v = s2.v
        |ORDER BY p2.u, p2.v""".stripMargin,

    // r22: Rdf.LabelPropRounds = 3 min-label flooding rounds unrolled as
    // chained CTE rounds over r18's support-2 subgraph — each round the
    // node keeps the min of its own and its neighbors' labels (every
    // node has >= 1 neighbor in the doubled edge list, so the inner
    // join covers all nodes)
    "r22_labelprop" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
        |   FROM lineitem),
        | e0 AS (SELECT a.p AS u, b.p AS v
        |   FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p
        |   GROUP BY a.p, b.p HAVING COUNT(*) >= 2),
        | u0 AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        | l0 AS (SELECT DISTINCT u AS n, u AS lbl FROM u0),
        | l1 AS (SELECT t.n, LEAST(t.lbl, MIN(x.lbl)) AS lbl FROM l0 t
        |   JOIN u0 ON u0.u = t.n JOIN l0 x ON x.n = u0.v
        |   GROUP BY t.n, t.lbl),
        | l2 AS (SELECT t.n, LEAST(t.lbl, MIN(x.lbl)) AS lbl FROM l1 t
        |   JOIN u0 ON u0.u = t.n JOIN l1 x ON x.n = u0.v
        |   GROUP BY t.n, t.lbl),
        | l3 AS (SELECT t.n, LEAST(t.lbl, MIN(x.lbl)) AS lbl FROM l2 t
        |   JOIN u0 ON u0.u = t.n JOIN l2 x ON x.n = u0.v
        |   GROUP BY t.n, t.lbl),
        | sz AS (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS comm_size
        |   FROM l3 GROUP BY lbl)
        |SELECT l3.n AS p_partkey, l3.lbl AS community, sz.comm_size
        |FROM l3 JOIN sz ON l3.lbl = sz.lbl ORDER BY p_partkey""".stripMargin,
  )
}
