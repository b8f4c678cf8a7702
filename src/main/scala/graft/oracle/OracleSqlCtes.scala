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
