package graft.oracle

/** DuckDB oracle SQL — LLM-pipeline text queries (l) and multimodal media queries (m): one slice of [[OracleSql.sql]]
  * (round-13 split of the single 3.4k-line string table; every string
  * is unchanged — the driver hash gate is the no-drift proof).
  */
private[oracle] object OracleSqlLlm {

  val sql: Map[String, String] = Map(


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

    // m7: whole-blob dedup groups — md5(VARCHAR) hashes the UTF-8 bytes,
    // exactly the Spark side's blob fingerprint on the encode(text) payload
    "m7_media_dedup" ->
      """WITH m AS (SELECT doc_id,
        |   CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |   octet_length(encode(text)) AS byte_len,
        |   md5(text) AS sig
        |  FROM documents)
        |SELECT sig, CAST(COUNT(*) AS BIGINT) AS n_items,
        | CAST(COUNT(DISTINCT kind) AS BIGINT) AS n_kinds,
        | MIN(doc_id) AS keep_doc,
        | CAST(MIN(byte_len) AS INT) AS item_bytes,
        | CAST((COUNT(*) - 1) * MIN(byte_len) AS BIGINT) AS dup_bytes
        |FROM m GROUP BY sig ORDER BY sig""".stripMargin,
  )
}
