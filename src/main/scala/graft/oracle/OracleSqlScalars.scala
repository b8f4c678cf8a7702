package graft.oracle

/** DuckDB oracle SQL — scalar-function queries (f) and the UDF/UDAF/typed surface (u): one slice of [[OracleSql.sql]]
  * (round-13 split of the single 3.4k-line string table; every string
  * is unchanged — the driver hash gate is the no-drift proof).
  */
private[oracle] object OracleSqlScalars {

  val sql: Map[String, String] = Map(


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


    // u5: the SQL-function body inlined — exactly what Catalyst sees
    "u5_sql_udf" ->
      """SELECT l_returnflag,
        | CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |   AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc,
        | COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,


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


    "f13_regex" ->
      """SELECT p_partkey,
        | regexp_extract(p_name, '^[a-z]+') AS first_word,
        | regexp_extract(p_name, '[a-z]+$') AS last_word,
        | regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
        | length(p_name)
        |  - length(regexp_replace(p_name, '[aeiou]', '', 'g')) AS n_vowels,
        | regexp_matches(p_name, 'widget$') AS is_widget
        |FROM part ORDER BY p_partkey""".stripMargin,


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


    "u7_typed_mapgroups" ->
      """SELECT c_nationkey, COUNT(*) AS n_cust,
        | CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
        |   AS DECIMAL(18,2)) AS DOUBLE) AS total_bal,
        | MIN(c_custkey) AS min_custkey, MAX(c_custkey) AS max_custkey
        |FROM customer GROUP BY 1 ORDER BY c_nationkey""".stripMargin,


    "f15_string3" ->
      """SELECT p_partkey, p_name,
        | lpad(p_name, 30, '.') AS padded,
        | rpad(p_name, 30, '*') AS rpadded,
        | translate(p_name, 'aeiou', 'AEIOU') AS shouted,
        | reverse(p_name) AS reversed,
        | repeat(substr(p_name, 1, 3), 2) AS echoed,
        | CAST(instr(p_name, 'a') AS BIGINT) AS first_a
        |FROM part ORDER BY p_partkey""".stripMargin,


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


    // u12: the typed pair join is the plain equi join in SQL
    "u12_typed_joinwith" ->
      """SELECT o_orderkey, c_name,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
  )
}
