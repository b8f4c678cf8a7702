package graft.oracle

/** DuckDB oracle SQL — training-data-pipeline extensions x34-x66: one slice of [[OracleSql.sql]]
  * (round-13 split of the single 3.4k-line string table; every string
  * is unchanged — the driver hash gate is the no-drift proof).
  */

import OracleSqlCtes.{x1Ctes, x13Ctes}
private[oracle] object OracleSqlX2 {

  val sql: Map[String, String] = Map(


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


    "x58_prefix_dedup" ->
      """WITH p AS (SELECT doc_id,
        |  md5(array_to_string(string_split(text, ' ')[1:20], ' ')) AS prefix_hash,
        |  md5(lower(trim(text))) AS fh FROM documents),
        | g AS (SELECT prefix_hash, MIN(doc_id) AS survivor_id,
        |  COUNT(*) AS n_docs, COUNT(DISTINCT fh) AS n_full_variants
        |  FROM p GROUP BY prefix_hash)
        |SELECT survivor_id, prefix_hash, n_docs, n_full_variants FROM g
        |WHERE n_docs >= 2 ORDER BY survivor_id""".stripMargin,


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

    // x67: the oracle states the tolerance flag as the constant 1 (x44's
    // declared-tolerance pattern) — a Spark HLL estimate off by >5% fails
    // the hash gate instead of shipping silently
    "x67_approx_vocab" ->
      """SELECT lang, COUNT(DISTINCT tok) AS exact_vocab, 1 AS within_5pct
        |FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |      FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "x68_context_curve" ->
      """WITH tc AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        | tot AS (SELECT COUNT(*) AS nd, CAST(SUM(n) AS BIGINT) AS tt FROM tc),
        | ls AS (SELECT unnest([64, 128, 256, 512, 1024]) AS ctx_len)
        |SELECT ctx_len,
        | CAST(SUM(CASE WHEN n > ctx_len THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_docs_truncated,
        | ROUND(CAST(SUM(CASE WHEN n > ctx_len THEN 1 ELSE 0 END) AS DOUBLE)
        |   / MAX(nd), 4) + 0.0 AS frac_docs_truncated,
        | CAST(SUM(CASE WHEN n > ctx_len THEN n - ctx_len ELSE 0 END) AS BIGINT)
        |   AS tokens_lost,
        | ROUND(CAST(SUM(CASE WHEN n > ctx_len THEN n - ctx_len ELSE 0 END) AS DOUBLE)
        |   / MAX(tt), 4) + 0.0 AS frac_tokens_lost
        |FROM ls, tc, tot GROUP BY ctx_len ORDER BY ctx_len""".stripMargin,

    // x69: the norm is quantized to 4 dp BEFORE banding and averaging
    // (l5's exact-decimal mean discipline), so both engines band and sum
    // identical doubles
    "x69_norm_audit" ->
      """WITH n AS (SELECT ROUND(sqrt(list_sum(list_transform(
        |    CAST(embedding AS DOUBLE[]), x -> x * x))), 4) + 0.0 AS nrm
        |  FROM embeddings)
        |SELECT CAST(FLOOR(nrm * 10) AS INT) AS norm_band, COUNT(*) AS n_vecs,
        | MIN(nrm) AS min_norm, MAX(nrm) AS max_norm,
        | ROUND(CAST(SUM(CAST(nrm AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4)
        |   + 0.0 AS mean_norm
        |FROM n GROUP BY 1 ORDER BY norm_band""".stripMargin,

    // x70: Pipeline.BpeRounds = 3 merge rounds unrolled as the shared
    // x70Ctes chain (OracleSqlCtes — x72 rides it verbatim); the
    // greedy-left merge is the IDENTICAL fold as Spark's `aggregate` —
    // list_reduce seeds from the first element, appends p2 without a
    // separator when the accumulator's last space-delimited symbol is p1
    "x70_bpe_train" -> (OracleSqlCtes.x70Ctes +
      """
        |SELECT round, pair, replace(pair, ' ', '') AS merged, cnt FROM (
        | SELECT 1 AS round, pair, cnt FROM t1
        | UNION ALL SELECT 2, pair, cnt FROM t2
        | UNION ALL SELECT 3, pair, cnt FROM t3) u
        |ORDER BY round""".stripMargin),

    // x72: x70's chain verbatim + the round-3 merge applied (v4); mass
    // sums are exact BIGINT, the ratio one rounded division vs round 0
    "x72_bpe_compression" -> (OracleSqlCtes.x70Ctes +
      """,
        | v4 AS (SELECT list_reduce(string_split(sym, ' '), (acc, x) ->
        |    CASE WHEN x = t.p2x AND (acc = t.p1x
        |      OR right(acc, length(t.p1x) + 1) = ' ' || t.p1x)
        |     THEN acc || x ELSE acc || ' ' || x END) AS sym, wc
        |  FROM v3, t3 t),
        | mass AS (
        |  SELECT 0 AS round, CAST(SUM(wc * len(string_split(sym, ' ')))
        |    AS BIGINT) AS corpus_symbols FROM v1
        |  UNION ALL SELECT 1, CAST(SUM(wc * len(string_split(sym, ' ')))
        |    AS BIGINT) FROM v2
        |  UNION ALL SELECT 2, CAST(SUM(wc * len(string_split(sym, ' ')))
        |    AS BIGINT) FROM v3
        |  UNION ALL SELECT 3, CAST(SUM(wc * len(string_split(sym, ' ')))
        |    AS BIGINT) FROM v4),
        | m0 AS (SELECT corpus_symbols AS m0 FROM mass WHERE round = 0)
        |SELECT round, corpus_symbols, m0 - corpus_symbols AS symbols_saved,
        | ROUND(CAST(corpus_symbols AS DOUBLE) / m0, 4) + 0.0 AS compression
        |FROM mass, m0 ORDER BY round""".stripMargin),

    // x71: bucket arithmetic on the max id (a scalar, never collected);
    // window SUM(BIGINT) is HUGEINT in DuckDB — cast before emission (D9)
    "x71_vocab_growth" ->
      """WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
        | d AS (SELECT (doc_id * 10) // (mx + 1) AS bucket, text
        |  FROM documents, mx),
        | bt AS (SELECT bucket,
        |   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM d GROUP BY bucket),
        | fb AS (SELECT tok, MIN(bucket) AS bucket FROM
        |   (SELECT bucket, unnest(string_split(text, ' ')) AS tok FROM d) x
        |  GROUP BY tok),
        | nt AS (SELECT bucket, COUNT(*) AS new_types FROM fb GROUP BY bucket)
        |SELECT bt.bucket, bt.n_tokens,
        | CAST(SUM(bt.n_tokens) OVER (ORDER BY bt.bucket) AS BIGINT)
        |   AS cum_tokens,
        | CAST(COALESCE(nt.new_types, 0) AS BIGINT) AS new_types,
        | CAST(SUM(COALESCE(nt.new_types, 0)) OVER (ORDER BY bt.bucket)
        |   AS BIGINT) AS cum_types
        |FROM bt LEFT JOIN nt ON bt.bucket = nt.bucket
        |ORDER BY bt.bucket""".stripMargin,

    // x73: x67's declared-tolerance pattern on the quantile sketch — the
    // oracle states the in-band flags as the constant 1; a Spark
    // approx_percentile drifting past its rank-error contract fails the
    // hash gate instead of shipping silently. Exact percentiles are
    // s19's quantile_cont parity.
    "x73_approx_quantile" ->
      """WITH e AS (SELECT event_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS v FROM events)
        |SELECT event_type, COUNT(*) AS n_events,
        | ROUND(quantile_cont(v, 0.5), 6) AS p50,
        | ROUND(quantile_cont(v, 0.95), 6) AS p95,
        | 1 AS p50_in_band, 1 AS p95_in_band
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
