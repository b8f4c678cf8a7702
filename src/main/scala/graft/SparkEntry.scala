package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._
import graft.oracle.OracleSql

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the oracle-declared inventory (SURVEY.md §2.9): every entry
  * has a paired DuckDB SQL string in `oracleSql` and the driver hash-compares
  * the two engines' outputs at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggs.a1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 scans & filters
    "c1_scan_project" -> (Core.c1 _),
    "c2_filter_pred" -> (Core.c2 _),
    // §2.2 joins
    "j1_inner_equi" -> (Joins.j1 _),
    "j2_broadcast" -> (Joins.j2 _),
    "j3_star_5way" -> (Joins.j3 _),
    "j4_left_outer" -> (Joins.j4 _),
    "j5_semi" -> (Joins.j5 _),
    "j6_anti" -> (Joins.j6 _),
    "j7_full_outer" -> (Joins.j7 _),
    "j8_theta_range" -> (Joins.j8 _),
    "j9_asof" -> (Joins.j9 _),
    "j10_cross" -> (Joins.j10 _),
    "j11_scalar_subquery" -> (Joins.j11 _),
    "j12_lateral_topn" -> (Joins.j12 _),
    "j13_salted_skew" -> (Joins.j13 _),
    "j14_fuzzy_join" -> (Joins.j14 _),
    "j15_interval_overlap" -> (Joins.j15 _),
    "j16_asof_nearest" -> (Joins.j16 _),
    "j17_bloom_semi" -> (Joins.j17 _),
    "j18_not_exists" -> (Joins.j18 _),
    "r8_pagerank_redist" -> (Rdf.r7Redistributed _),
    // §2.3 aggregation / sort / set ops
    "a1_pricing_summary" -> (Aggs.a1 _),
    "a2_distinct_agg" -> (Aggs.a2 _),
    "a3_rollup" -> (Aggs.a3 _),
    "a4_cube" -> (Aggs.a4 _),
    "a5_grouping_sets" -> (Aggs.a5 _),
    "a6_sort_limit_offset" -> (Core.a6 _),
    "a7_union" -> (Core.a7 _),
    "a8_intersect" -> (Core.a8 _),
    "a9_except" -> (Core.a9 _),
    "a10_median_pct" -> (Aggs.a10 _),
    "a11_cond_agg" -> (Aggs.a11 _),
    "a12_stat_moments" -> (Aggs.a12 _),
    "a13_unpivot" -> (Aggs.a13 _),
    "a14_pivot" -> (Aggs.a14 _),
    "a15_histogram" -> (Aggs.a15 _),
    "a16_listagg" -> (Aggs.a16 _),
    "a17_regression" -> (Aggs.a17 _),
    "a18_calendar_fill" -> (Aggs.a18 _),
    "a19_interp_fill" -> (Aggs.a19 _),
    "a20_weighted_median" -> (Aggs.a20 _),
    "a21_mode" -> (Aggs.a21 _),
    "a22_mad" -> (Aggs.a22 _),
    // §2.4 windows + RDF view
    "w1_rank_trio" -> (Windows.w1 _),
    "w2_topk_per_group" -> (Windows.w2 _),
    "w3_running" -> (Windows.w3 _),
    "w4_lag_lead" -> (Windows.w4 _),
    "w5_moving_avg" -> (Windows.w5 _),
    "w6_rank_stats" -> (Windows.w6 _),
    "w7_value_picks" -> (Windows.w7 _),
    "w8_ntile_spend" -> (Windows.w8 _),
    "w9_interval_range" -> (Windows.w9 _),
    "r1_triples_view" -> (Rdf.r1 _),
    "r2_star_bgp" -> (Rdf.r2 _),
    "r3_path_join" -> (Rdf.r3 _),
    "r4_optional_bgp" -> (Rdf.r4 _),
    "r5_property_path" -> (Rdf.r5 _),
    "r6_degree_dist" -> (Rdf.r6 _),
    "r7_pagerank" -> (Rdf.r7 _),
    "r9_triangles" -> (Rdf.r9 _),
    "r10_bipartite_proj" -> (Rdf.r10 _),
    "r11_bfs" -> (Rdf.r11 _),
    // §2.5 scalar functions
    "f1_string" -> (Scalars.f1 _),
    "f2_date" -> (Scalars.f2 _),
    "f3_math" -> (Scalars.f3 _),
    "f4_array" -> (Scalars.f4 _),
    "f5_json" -> (Scalars.f5 _),
    "f6_conditional" -> (Scalars.f6 _),
    "f7_string2" -> (Scalars.f7 _),
    "f8_json_keys" -> (Scalars.f8 _),
    "f9_bitwise" -> (Scalars.f9 _),
    "f10_map_funcs" -> (Scalars.f10 _),
    "f11_struct_funcs" -> (Scalars.f11 _),
    "f12_trig" -> (Scalars.f12 _),
    "f13_regex" -> (Scalars.f13 _),
    "f14_datetrunc" -> (Scalars.f14 _),
    // §2.6 event/stream (batch-equivalent)
    "s1_tumbling" -> (Events.s1 _),
    "s2_sliding" -> (Events.s2 _),
    "s3_session" -> (Events.s3 _),
    "s4_dedup_first" -> (Events.s4 _),
    "s5_funnel" -> (Events.s5 _),
    "s6_retention" -> (Events.s6 _),
    "s7_rolling_active" -> (Events.s7 _),
    "s8_transitions" -> (Events.s8 _),
    // §2.7 UDF/UDAF/generator
    "u1_scalar_udf" -> (Udfs.u1 _),
    "u2_udaf_wavg" -> (Udfs.u2 _),
    "u3_generator" -> (Udfs.u3 _),
    "u4_posexplode_outer" -> (Udfs.u4 _),
    "u5_sql_udf" -> (Udfs.u5 _),
    "u6_centroid_agg" -> (Udfs.u6 _),
    // §2.8 LLM-pipeline ops
    "l1_dedup_exact" -> (Llm.l1 _),
    "l2_neardup_jaccard" -> (Llm.l2 _),
    "l3_cosine_topk" -> (Llm.l3 _),
    "l4_tokenize" -> (Llm.l4 _),
    "l5_text_stats" -> (Llm.l5 _),
    "l6_bm25" -> (Llm.l6 _),
    "l7_tfidf" -> (Llm.l7 _),
    "l8_pmi_colloc" -> (Llm.l8 _),
    "l9_keyword_topk" -> (Llm.l9 _),
    // training-data-pipeline extensions (builder brief)
    "x1_minhash_lsh" -> (Pipeline.x1 _),
    "x2_simhash" -> (Pipeline.x2 _),
    "x3_ngram_jaccard" -> (Pipeline.x3 _),
    "x4_embed_neardup" -> (Pipeline.x4 _),
    "x5_langid" -> (Pipeline.x5 _),
    "x6_quality_score" -> (Pipeline.x6 _),
    "x7_token_count" -> (Pipeline.x7 _),
    "x8_fingerprint" -> (Pipeline.x8 _),
    "x9_ann_lsh" -> (Pipeline.x9 _),
    "x10_simhash_pairs" -> (Pipeline.x10 _),
    "x11_ann_ivf" -> (Pipeline.x11 _),
    "x12_split_sample" -> (Pipeline.x12 _),
    "x13_lm_score" -> (Pipeline.x13 _),
    "x14_contamination" -> (Pipeline.x14 _),
    "x15_source_diversity" -> (Pipeline.x15 _),
    "x16_repetition" -> (Pipeline.x16 _),
    "x17_cross_source" -> (Pipeline.x17 _),
    "x18_quality_gate" -> (Pipeline.x18 _),
    "x19_weighted_sample" -> (Pipeline.x19 _),
    "x20_dup_clusters" -> (Pipeline.x20 _),
    "x21_semdedup" -> (Pipeline.x21 _),
    "x21_semdedup_learned" -> (Pipeline.x21Learned _),
    "x22_training_manifest" -> (Pipeline.x22 _),
    "x23_containment" -> (Pipeline.x23 _),
    "x24_repeated_spans" -> (Pipeline.x24 _),
    "x25_dedup_keep_list" -> (Pipeline.x25 _),
    "x26_vocab_coverage" -> (Pipeline.x26 _),
    "x27_shard_pack" -> (Pipeline.x27 _),
    "x28_mixture_weights" -> (Pipeline.x28 _),
    "x29_chunk_dedup" -> (Pipeline.x29 _),
    "x30_token_entropy" -> (Pipeline.x30 _),
    "x31_bpe_pairs" -> (Pipeline.x31 _),
    "x32_chunk_rewrite" -> (Pipeline.x32 _),
    "x33_ppl_bucket" -> (Pipeline.x33 _),
    "x34_winnow" -> (Pipeline.x34 _),
    "x35_hll_users" -> (Sketches.x35 _),
    "x36_cms_words" -> (Sketches.x36 _),
    "x37_corpus_stats" -> (Pipeline.x37 _),
    "x38_incr_dedup" -> (Pipeline.x38 _),
    "x39_domain_cap" -> (Pipeline.x39 _),
    "x40_curation_funnel" -> (Pipeline.x40 _),
    "x41_shard_audit" -> (Pipeline.x41 _),
    "s9_rate_window" -> (Events.s9 _),
    "s10_cum_users" -> (Events.s10 _),
    "s11_gap_stats" -> (Events.s11 _),
    "s12_sessionize" -> (Events.s12 _),
    "s13_anomaly_days" -> (Events.s13 _),
    "w10_pareto_share" -> (Windows.w10 _),
    "u7_typed_mapgroups" -> (Udfs.u7 _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = OracleSql.sql
}
