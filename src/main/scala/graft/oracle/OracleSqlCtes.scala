package graft.oracle

/** CTE chains shared VERBATIM across x-family oracle strings (x1/x17/x44/
  * x57/x59/x63 ride x1Ctes; x13/x33 ride x13Ctes) so paired oracles can
  * never drift apart. Split out of OracleSql round 13.
  */
private[oracle] object OracleSqlCtes {

  /** x1's candidate-generation CTE chain, shared verbatim by x17 (which
    * rolls the same verified pairs up per source pair) so the two oracles
    * can never drift apart.
    */
  private[oracle] val x1Ctes =
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

  /** x70's 3-round BPE trainer chain (tf → v1 → pc1/t1 → v2 → pc2/t2 →
    * v3 → pc3/t3), shared verbatim by x72's compression rollup (which
    * appends a v4 = round-3 merge applied) so the two oracles cannot
    * drift. The list_reduce lambda is the IDENTICAL greedy-left fold as
    * the Spark side's `aggregate` (Pipeline.BpeMergeExpr).
    */
  private[oracle] val x70Ctes =
    """WITH tf AS (SELECT w, COUNT(*) AS wc
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE length(w) >= 2 GROUP BY w),
      | v1 AS (SELECT array_to_string(list_transform(
      |    range(1, length(w) + 1), i -> w[i]), ' ') AS sym, wc FROM tf),
      | pc1 AS (SELECT pair, CAST(SUM(wc) AS BIGINT) AS cnt FROM (
      |   SELECT wc, unnest(list_transform(range(1, len(l)),
      |     i -> l[i] || ' ' || l[i + 1])) AS pair
      |   FROM (SELECT string_split(sym, ' ') AS l, wc FROM v1))
      |  GROUP BY pair),
      | t1 AS (SELECT pair, cnt, string_split(pair, ' ')[1] AS p1x,
      |   string_split(pair, ' ')[2] AS p2x
      |  FROM pc1 ORDER BY cnt DESC, pair LIMIT 1),
      | v2 AS (SELECT list_reduce(string_split(sym, ' '), (acc, x) ->
      |    CASE WHEN x = t.p2x AND (acc = t.p1x
      |      OR right(acc, length(t.p1x) + 1) = ' ' || t.p1x)
      |     THEN acc || x ELSE acc || ' ' || x END) AS sym, wc
      |  FROM v1, t1 t),
      | pc2 AS (SELECT pair, CAST(SUM(wc) AS BIGINT) AS cnt FROM (
      |   SELECT wc, unnest(list_transform(range(1, len(l)),
      |     i -> l[i] || ' ' || l[i + 1])) AS pair
      |   FROM (SELECT string_split(sym, ' ') AS l, wc FROM v2))
      |  GROUP BY pair),
      | t2 AS (SELECT pair, cnt, string_split(pair, ' ')[1] AS p1x,
      |   string_split(pair, ' ')[2] AS p2x
      |  FROM pc2 ORDER BY cnt DESC, pair LIMIT 1),
      | v3 AS (SELECT list_reduce(string_split(sym, ' '), (acc, x) ->
      |    CASE WHEN x = t.p2x AND (acc = t.p1x
      |      OR right(acc, length(t.p1x) + 1) = ' ' || t.p1x)
      |     THEN acc || x ELSE acc || ' ' || x END) AS sym, wc
      |  FROM v2, t2 t),
      | pc3 AS (SELECT pair, CAST(SUM(wc) AS BIGINT) AS cnt FROM (
      |   SELECT wc, unnest(list_transform(range(1, len(l)),
      |     i -> l[i] || ' ' || l[i + 1])) AS pair
      |   FROM (SELECT string_split(sym, ' ') AS l, wc FROM v3))
      |  GROUP BY pair),
      | t3 AS (SELECT pair, cnt, string_split(pair, ' ')[1] AS p1x,
      |   string_split(pair, ' ')[2] AS p2x
      |  FROM pc3 ORDER BY cnt DESC, pair LIMIT 1)""".stripMargin

  /** x13's scoring CTE chain (through a per-doc `scored` frame), shared
    * verbatim by x33's bucketing rollup so the two oracles cannot drift.
    */
  private[oracle] val x13Ctes =
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
}
