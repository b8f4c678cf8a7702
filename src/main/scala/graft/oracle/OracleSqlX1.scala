package graft.oracle

/** DuckDB oracle SQL — training-data-pipeline extensions x1-x33: one slice of [[OracleSql.sql]]
  * (round-13 split of the single 3.4k-line string table; every string
  * is unchanged — the driver hash gate is the no-drift proof).
  */

import OracleSqlCtes.{x1Ctes, x13Ctes}
private[oracle] object OracleSqlX1 {

  val sql: Map[String, String] = Map(


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
  )
}
