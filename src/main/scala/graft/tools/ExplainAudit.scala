// Plan audit (run via: sbt 'runMain graft.tools.ExplainAudit') — dumps
// formatted physical plans for representative queries so pushdown/broadcast/
// shuffle structure can be reviewed (builder brief: iterate on .explain).
package graft.tools

import org.apache.spark.sql.SparkSession

object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.install(spark) // the driver-path plans (j20's rule)
    val interesting = Seq("c1_scan_project", "c2_filter_pred", "j2_broadcast",
      "j3_star_5way", "j9_asof", "a1_pricing_summary", "l3_cosine_topk",
      "x1_minhash_lsh", "x3_ngram_jaccard", "x4_embed_neardup",
      "x10_simhash_pairs",
      "a12_stat_moments", "a13_unpivot", "l6_bm25", "x11_ann_ivf",
      "j11_scalar_subquery", "r5_property_path",
      "x14_contamination", "x16_repetition", "x17_cross_source",
      "x20_dup_clusters", "x21_semdedup", "x21_semdedup_learned",
      "j12_lateral_topn", "l8_pmi_colloc", "s8_transitions",
      "a17_regression", "x22_training_manifest", "f11_struct_funcs",
      "x24_repeated_spans", "x25_dedup_keep_list", "r7_pagerank",
      "x26_vocab_coverage", "x27_shard_pack", "x28_mixture_weights",
      "r9_triangles", "r10_bipartite_proj", "r11_bfs", "j14_fuzzy_join",
      "j15_interval_overlap", "w8_ntile_spend", "a20_weighted_median",
      "x35_hll_users", "x36_cms_words", "x37_corpus_stats",
      "j16_asof_nearest", "j17_bloom_semi", "j18_not_exists",
      "w10_pareto_share", "a22_mad", "l9_keyword_topk", "s12_sessionize",
      "x39_domain_cap", "x40_curation_funnel", "x41_shard_audit",
      "r12_sssp_bounded", "x42_ngram_novelty", "x43_kl_drift",
      "x44_minhash_accuracy", "u8_udaf_window", "s14_late_events",
      "x45_dsir_weights", "x46_temperature_mix", "j19_band_bucket",
      "r13_harmonic", "s16_peak_hour", "x49_fertility", "j20_or_join",
      "x57_incr_neardup", "w12_topk_ties", "r17_clustering",
      "x58_prefix_dedup", "s18_churn",
      // round 13: the BPE chain (Ckpt'd 1-row top-pair broadcasts), the
      // edge-bounded bridge anti-join, the attribution pair join
      "x70_bpe_train", "x72_bpe_compression", "r20_local_bridges",
      "s26_linear_attribution", "s27_sequence_funnel", "m7_media_dedup",
      // round 14: the label-flood round joins, the percentile-sketch agg
      "r22_labelprop", "x73_approx_quantile")
    interesting.foreach { name =>
      println(s"\n===== $name =====")
      println(graft.SparkEntry.queries(name)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
