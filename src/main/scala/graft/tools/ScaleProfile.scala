package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-exponent stress profile for the pair-output operators: time each
  * at 1×/2×/4×/8× the sf0.1 corpus and record the growth curve, so the
  * "near-linear at 100 TB" claims in the operator docstrings are measured,
  * not asserted. Run: `sbt 'runMain graft.tools.ScaleProfile'` (optionally
  * `<srcSfDir> <outBase>`); results land in BASELINE.md's scaling table.
  *
  * Synthetic corpora are m re-keyed copies of the fixture (testdata is
  * read-only, so they are written under /tmp):
  *  - documents: doc_id offset per copy; for copies > 0 every text token
  *    gets a `_i` suffix, which keeps each copy's internal near-dup
  *    structure byte-identical while making copies SHINGLE-DISJOINT —
  *    cross-copy pairs are impossible, so the true pair output grows
  *    linearly in m and the timing isolates the engine's scaling rather
  *    than a quadratic explosion of the answer itself;
  *  - embeddings: vec_id offset per copy; the vector is rotated by i
  *    positions (norm-preserving, so no copy is an exact clone). x21's
  *    DECLARED codebook stays k = 16 regardless of m, so its within-cell
  *    population grows ∝ m and the pair join ∝ m² — the fixed-k caveat
  *    x21's docstring declares, quantified here on purpose; the linear
  *    path is raising k with the corpus (x21With / x21_semdedup_learned's
  *    trainer at production k).
  *
  * Timing protocol: interleaved min-of-3 (BASELINE.md's attribution
  * protocol — repeats of one cell sit a full pass apart, so a transient
  * load spike cannot hit all three).
  */
object ScaleProfile {

  val Queries = Seq("x1_minhash_lsh", "x3_ngram_jaccard", "x4_embed_neardup",
    "x10_simhash_pairs", "x20_dup_clusters", "x23_containment",
    "x21_semdedup", "x21_semdedup_learned", "x24_repeated_spans",
    "x25_dedup_keep_list", "x27_shard_pack", "r7_pagerank",
    "x29_chunk_dedup", "x32_chunk_rewrite", "r8_pagerank_redist",
    "s9_rate_window", "x33_ppl_bucket", "x34_winnow",
    // round-8 continuation: graph/join/window/sketch heavies (copies are
    // disjoint subgraphs, so r9/r10/r11/j15's true answers grow linearly;
    // j14's name vocabulary is SHARED across copies — group counts grow
    // ×m, DP work constant — the real-catalog regime; x35's register
    // tables stay ≤ m=256 per type by construction)
    "r9_triangles", "r10_bipartite_proj", "r11_bfs", "j14_fuzzy_join",
    "j15_interval_overlap", "w8_ntile_spend", "x35_hll_users",
    "x36_cms_words", "a20_weighted_median", "x37_corpus_stats",
    "x38_incr_dedup", "w9_interval_range",
    // round-8 continuation 2: the corpus-window family (l9's TF-IDF +
    // doc-keyed rank, s12's user-keyed sessionization over m× events,
    // x40's five chained survivor stages, j16's two-frame as-of window)
    "l9_keyword_topk", "s12_sessionize", "x40_curation_funnel",
    "j16_asof_nearest",
    // round 9: x42/x44's token shapes scale ×m (copy vocabularies are
    // disjoint — suffixed tokens — so posting lists and LSH bands grow
    // linearly, never across copies); x43's (source, word) counts grow ×m
    // under the SHARED source axis; u8/s14 replicate per-key windows over
    // disjoint supplier/user populations; r12's frontier stays inside copy
    // 0's component (single-source from the global min key) while its edge
    // build scales ×m — the row isolates the build-dominated regime
    "x42_ngram_novelty", "x43_kl_drift", "x44_minhash_accuracy",
    "u8_udaf_window", "s14_late_events", "r12_sssp_bounded",
    // round-9 batch 3: r13's copies are disjoint subgraphs and each
    // copy's key range still contains exactly 1% ≡0-mod-100 keys (the
    // offset shifts WHICH residue class, not its density), so panel AND
    // state grow ×m — the multi-source regime the panel knob bounds;
    // s15/s16/x48/x49/x50 are keyed-agg shapes over ×m rows with
    // domain-bounded (or 9-row) outputs — flat-to-linear, recorded not
    // assumed
    "r13_harmonic", "s15_streaks", "s16_peak_hour", "x48_benford",
    "x49_fertility", "x50_pad_waste",
    // j20's nation axis is offset per copy (same-nation pairs ×m,
    // disjoint) while acctbal values are SHARED across copies — the
    // bal-equality branch's true matches grow m² (j19's shared-value
    // regime) but stay collision-rare; the row isolates the two hash
    // branches' keyed shuffles
    "j20_or_join",
    // round 10 (verdict item 6): the two pre-round-8 heavies whose 1×–8×
    // rows predated the current plans — l2's shingle sets and x17's
    // cross-source MinHash bands are both built from the per-copy
    // SUFFIXED token streams, so copies are shingle-disjoint and the true
    // pair output grows linearly in m (same argument as x1/x3)
    "l2_neardup_jaccard", "x17_cross_source",
    // round-10 new queries: r14/r15 run on the ×m disjoint co-purchase
    // subgraphs (peels and triangle-edge counts replicate copy 0 → true
    // answers ×m); s17 replicates per-user windows over disjoint user
    // populations; a23 groups by the SHARED 5-priority axis (×m rows per
    // group — the percentile/clamp cost axis); x51's top-100 vocabulary
    // and x52's top-20 df lists draw from the ×m disjoint suffixed
    // vocabularies (count shuffles scale, bounded tails constant); x53's
    // source axis is shared (20 rows at any m); w11 is the heap-operator
    // shape — shuffle ≤ k·groups·partitions at any m
    "r14_kcore", "r15_jaccard_links", "s17_bursts", "a23_winsorized",
    "x51_zipf_fit", "x52_first_position", "x53_source_gini",
    "w11_topk_plain",
    // round-10 batch 3: nation keys are OFFSET per copy (disjoint nation
    // ranges), so j21's keyed pair classes and a24's nation groups grow
    // ×m with no cross-copy matches, and only copy 0 carries the nulled
    // nation 24 (constant null class); x54/x55 are token shapes over ×m
    // docs with disjoint suffixed vocabularies (bounded bucket/octave
    // outputs at any m)
    "j21_nullsafe", "a24_hhi", "x54_length_bias", "x55_shingle_df",
    // r16 runs over ×m disjoint subgraphs whose per-copy degree
    // distributions replicate copy 0 — the statistic itself is
    // m-invariant, the cost axis is the ×m edge/degree joins
    "r16_assortativity",
    // x56: suffixed copies make texts distinct across copies, so the
    // duplicate structure replicates copy 0 — hash groups ×m, shares flat
    "x56_dup_inflation",
    // round 11 — x57: copies are shingle-disjoint (suffixed tokens), so
    // every batch doc classifies within its own copy and the true output
    // (= batch roster) grows ×m; the cost axes are the banded index
    // equi-joins and the two signature-verify joins, all keyed. The copy
    // offset i·nd shifts WHICH doc_ids land in the %5 batch residue, not
    // its ~20% density, so batch/corpus proportions hold at every m
    "x57_incr_neardup",
    // round-11 batch 2: w12 is the tie-keeping heap-operator shape
    // (suppliers ×m disjoint, per-group tie classes replicate copy 0);
    // r17 rides the ×m disjoint subgraphs' triangle frames (answers ×m);
    // x58's prefix groups are copy-local (suffixed tokens make prefixes
    // disjoint) so groups grow ×m; s18 is a user-keyed agg over disjoint
    // ×m user populations with one 1-row broadcast join
    "w12_topk_ties", "r17_clustering", "x58_prefix_dedup", "s18_churn",
    // round-11 batch 3: a25 is a single nation-keyed agg over ×m rows
    // (nation domains offset per copy → groups ×m, argmax partials
    // constant-size); f16 is a pure narrow projection (flat per-row
    // cost, ×m rows); x59 rides x1's banded candidate shape (copies
    // shingle-disjoint → verified pairs ×m, 7-row output at any m)
    "a25_agg_batch", "f16_editdist", "x59_jaccard_sweep",
    // w13 is w12's dense sibling: ≤ 2 value classes per supplier, ×m
    // disjoint supplier groups; s19 is one type-keyed exact-percentile
    // agg over ×m rows (shared 10-type axis — output constant)
    "w13_topk_dense", "s19_value_quantiles",
    // round 12 — the m-group rides ×m documents copies: m1 is a narrow
    // mapPartitions hash pass + 3-group agg (blob mass ×m, output
    // constant); m2's frame flatMap is linear in blob bytes (×m rows
    // out); m3's prefix groups are COPY-LOCAL (suffixed tokens change
    // byte 1 of most prefixes) so groups grow ~×m with no cross-copy
    // collisions
    "m1_media_rollup", "m2_frame_sample", "m3_media_prefix",
    // round-12 batch 2: m4 adds one doc_id-keyed join to m1's shape (lang
    // axis shared → cells constant, rows ×m); f17 is a pure narrow lambda
    // projection (×m rows); a26's histogram state is the 50-value quantity
    // domain per flag (constant) over ×m rows; s20 is a (type, dow)-keyed
    // count (output constant); j22 rides the ×m orders⨝lineitem equi
    // shape (disjoint orderkey copies); u9's reduce is map-side combined
    // over ×m disjoint user populations; x60's suffix groups REPLICATE
    // copy 0 (suffixed tokens make tails copy-local) → groups ×m
    "m4_media_mix", "f17_higher_order", "a26_quantile_disc",
    "s20_dow_profile", "j22_exists_flags", "u9_typed_argmax",
    "x60_suffix_dedup",
    // round-12 batch 3: m5's chunk groups are copy-local (the per-copy
    // token suffix shifts every 64-byte boundary's bytes) → groups ×m,
    // no cross-copy collisions; u10/s21 ride disjoint ×m user
    // populations (gap rows ×m; adoption cells constant — types shared);
    // f18 is a pure narrow projection; x61's source axis is SHARED so
    // strata grow ×m deep while the k=5 output stays 20·k rows — the
    // per-stratum heap shape; x62's distinct domains are shared (lang/
    // source) or near-shared (n_chars) — the Expand shuffle scales ×m,
    // output fixed at 3 rows
    "m5_media_chunks", "u10_flatmap_gaps", "s21_type_adoption",
    "f18_format", "x61_stratified_sample", "x62_profile_card",
    // round-12 batch 4: r18's support-2 subgraph replicates per disjoint
    // copy (components ×m, diameters unchanged — CC rounds constant, per-
    // round joins ×m); m6 rides m1's metadata shape (3 groups at any m);
    // f19 is a pure narrow projection; u11 cogroups ×m disjoint orderkey
    // copies (groups ×m, per-group state ~4 lineitems); l10's cells are
    // the shared 5×5 lang matrix over ×m docs; s22 rides disjoint ×m user
    // populations into a shared type×type cell grid; x63's bucket sizes
    // REPLICATE copy 0 (suffixed tokens make signatures copy-local), so
    // size classes are m-invariant while bucket counts grow ×m; x64's
    // chunks are copy-local for the same reason — groups ×m
    "r18_components", "m6_size_profile", "f19_url_parse",
    "u11_cogroup_recon", "l10_lang_confusion", "s22_first_touch",
    "x63_band_occupancy", "x64_cdc_chunks",
    // round-12 batch 5: r19 rides the ×m disjoint subgraphs (per-copy
    // degree distributions replicate copy 0, so the curve is m-invariant
    // while the end-pair joins grow ×m); x65's bands are the shared 11-row
    // axis over ×m docs (dup groups replicate copy 0 under suffixed
    // copies); x66's bucket sizes replicate copy 0 per config (signatures
    // copy-local) — bucket COUNTS ×m, 3 output rows; f20 is a pure narrow
    // projection; s23's coverage explode is ×28 the ×m (user, day) frame
    // with disjoint user populations; u12 is the orders⨝customer equi
    // shape over ×m disjoint key copies
    "r19_neighbor_degree", "x65_quality_dup_lift", "x66_band_whatif",
    "f20_try_funcs", "s23_stickiness", "u12_typed_joinwith",
    // round 13: s24 rides disjoint ×m user populations (cohort weeks
    // shared → rows ×m into a fixed week axis); x67's exact distinct
    // explodes ×m docs into the 5-lang axis with ~disjoint suffixed
    // vocabularies (HLL registers constant per lang); x68 is a narrow
    // token-count pass ×m into a literal 5-length axis; x69 is one
    // narrow dot-product pass over ×m rotated vectors into a constant
    // band axis
    "s24_conversion_lag", "x67_approx_vocab", "x68_context_curve",
    "x69_norm_audit",
    // round-13 batch 2: x70's per-round work is vocabulary-sized — the
    // suffixed ×m vocabularies grow ~×m so rounds scale with corpus, but
    // the corpus explode happens once into the Ckpt'd tf table; x71 is
    // one token-keyed min-agg ×m into a fixed 10-bucket axis; s25's
    // window rides the calendar-bounded daily aggregate (corpus work =
    // one keyed count); s26's pair fan-out is per-user-bounded and user
    // populations are disjoint across ×m copies; r20 rides the ×m
    // disjoint co-purchase subgraphs (triangle/bridge sets replicate
    // copy 0); m7's dup groups replicate copy 0 under suffixed copies
    "x70_bpe_train", "x71_vocab_growth", "s25_ewma_anomaly",
    "s26_linear_attribution", "r20_local_bridges", "m7_media_dedup",
    // round-13 batch 3: x72 rides x70's vocabulary-sized chain (4 extra
    // vocab-sized aggs); s27 is user-keyed window/agg/join over disjoint
    // ×m user populations into a fixed 3-row axis
    "x72_bpe_compression", "s27_sequence_funnel",
    // r21 rides the ×m disjoint co-purchase subgraphs; per-copy truss
    // structure replicates copy 0, rounds stay 2, enumeration ∝ edges
    "r21_truss",
    // round 14: r22 is 3× (keyed join + keyed MIN) over the ×m disjoint
    // subgraphs — linear in edges, labels replicate copy 0 per copy;
    // x73 is one type-keyed agg with O(accuracy) sketch state per group
    // into a |types|-row axis
    "r22_labelprop", "x73_approx_quantile")

  val DefaultMults = Seq(1, 2, 4, 8)

  /** Multipliers from `SPARK_GRAFT_MULTS` (e.g. "16,32" for the round-11
    * knee sweep past the standard 1×–8× ladder) or the default ladder. */
  def Mults: Seq[Int] = sys.env.get("SPARK_GRAFT_MULTS")
    .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(DefaultMults)

  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val base = if (args.length > 1) args(1) else "/tmp/graft-scale"
    // optional trailing args: restrict to a query subset (re-profiling one
    // operator without paying for the whole suite)
    val qs = if (args.length > 2) args.drop(2).toSeq else Queries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle width decoupled from thread count (round-11 verdict item 2:
    // the 16x/32x knee cells were measured at a deliberately PINNED 32-way
    // width to expose per-partition hash-build memory; a real cluster
    // scales width with data, so the width-proof sweep re-runs the knee
    // with SPARK_GRAFT_SHUFFLE=64/128 and expects the super-linear cells
    // to flatten toward ~2.1x/doubling).
    val shuf = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Mults.foreach(m => build(spark, src, s"$base/m$m", m))

    val best = scala.collection.mutable.Map[(String, Int), Double]()
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    (1 to reps).foreach { _ =>
      Mults.foreach { m =>
        qs.foreach { q =>
          val preexisting = spark.sparkContext.getPersistentRDDs.keySet
          val t0 = System.nanoTime()
          // SPARK_GRAFT_R8_ADAPTIVE=1 swaps r8's declared fixed-unit face
          // for the adaptive one — the ONLY way to run the m16/m32 cells
          // (5.14M/10.3M nodes trip r7MassGuard at the declared 10^12;
          // adaptiveUnit selects 10^11 there, the guard's documented remedy)
          val fn: (org.apache.spark.sql.SparkSession, String) => DataFrame =
            if (q == "r8_pagerank_redist" &&
                sys.env.get("SPARK_GRAFT_R8_ADAPTIVE").contains("1"))
              graft.ops.Rdf.r7RedistributedAdaptive
            else graft.SparkEntry.queries(q)
          graft.BenchAction.exec(fn(spark, s"$base/m$m"))
          val t = (System.nanoTime() - t0) / 1e9
          // release only the Ckpt'd blocks THIS rep created (Bench.once's
          // discipline — blanket unpersist invalidates future caches)
          spark.sparkContext.getPersistentRDDs
            .foreach { case (id, rdd) =>
              if (!preexisting.contains(id)) rdd.unpersist(blocking = false)
            }
          val k = (q, m)
          best(k) = math.min(best.getOrElse(k, Double.MaxValue), t)
        }
      }
    }
    val ms = Mults
    println(ms.map(m => s"${m}x s").mkString("| query | ", " | ", " | last/first |"))
    println("|---" * (ms.size + 2) + "|")
    qs.foreach { q =>
      val ts = ms.map(m => best((q, m)))
      println(ts.map(t => f"$t%.2f").mkString(s"| $q | ", " | ",
        f" | ${ts.last / ts.head}%.1f× |"))
    }
    spark.stop()
  }

  def build(spark: SparkSession, src: String, dst: String, m: Int): Unit = {
    buildEvents(spark, src, dst, m) // additive (own sentinel): older cached
    buildPart(spark, src, dst, m)   // corpus dirs predate these tables and
    // must not be rebuilt for them
    // _SUCCESS of the LAST-written table — a bare directory check would
    // silently reuse the partial output of an interrupted earlier build
    if (new java.io.File(s"$dst/region.parquet/_SUCCESS").exists()) return
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nd = docs.agg(max("doc_id")).head().getLong(0) + 1
    (0 until m).map { i =>
      docs.select(
        (col("doc_id") + lit(i * nd)).as("doc_id"),
        (if (i == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", "$1_" + i)).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val ne = emb.agg(max("vec_id")).head().getLong(0) + 1
    (0 until m).map { i =>
      emb.select(
        (col("vec_id") + lit(i * ne)).as("vec_id"),
        (if (i == 0) col("embedding")
         else expr(s"concat(slice(embedding, ${i + 1}, ${64 - i})," +
           s" slice(embedding, 1, $i))")).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    // star-schema copies for the graph/relational heavies (r7): every key
    // column is offset by i·(domainMax+1) per copy, so each copy is a
    // DISJOINT subgraph — r7's true answer grows linearly in m and the
    // timing isolates the engine's iterative-join scaling. The offset is
    // ONE PER KEY DOMAIN, computed from the domain's OWNING (PK-side)
    // table and reused for every referencing column: per-table maxima
    // would keep FK/PK copies aligned only while max(FK) == max(PK)
    // happens to hold in the fixture (e.g. an order referencing the
    // top customer) — a regenerated fixture where the top dimension row
    // is unreferenced would silently break the disjoint-subgraph property.
    def domMax(name: String, k: String): Long =
      spark.read.parquet(s"$src/$name.parquet")
        .agg(max(col(k).cast("bigint"))).head().getLong(0) + 1
    val dom = Map(
      "orderkey" -> domMax("orders", "o_orderkey"),
      "custkey" -> domMax("customer", "c_custkey"),
      "suppkey" -> domMax("supplier", "s_suppkey"),
      "partkey" -> domMax("part", "p_partkey"),
      "nationkey" -> domMax("nation", "n_nationkey"),
      "regionkey" -> domMax("region", "r_regionkey"))
    def copyKeyed(name: String, keyCols: Map[String, String]): Unit = {
      val t = spark.read.parquet(s"$src/$name.parquet")
      // Disjointness requires every referencing value to live INSIDE its
      // owning domain: if a regenerated fixture ever ships an FK above its
      // PK max, copy i's offset rows would collide with copy i+1's range
      // and the disjoint-subgraph baseline would silently corrupt. Fail
      // loudly instead (one dimension-sized agg per key col, build-time only).
      keyCols.foreach { case (c, d) =>
        val mx = t.agg(max(col(c).cast("bigint"))).head().getLong(0)
        require(mx < dom(d),
          s"$name.$c max $mx breaches its key domain '$d' (${dom(d)}) — " +
            "fixture violates referential containment; offsets would collide")
      }
      (0 until m).map { i =>
        t.select(t.columns.map { c =>
          keyCols.get(c) match {
            case Some(d) =>
              (col(c).cast("bigint") + lit(i * dom(d))).as(c)
            case None => col(c)
          }
        }: _*)
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
    }
    copyKeyed("lineitem", Map("l_orderkey" -> "orderkey",
      "l_partkey" -> "partkey", "l_suppkey" -> "suppkey"))
    copyKeyed("orders", Map("o_orderkey" -> "orderkey",
      "o_custkey" -> "custkey"))
    copyKeyed("customer", Map("c_custkey" -> "custkey",
      "c_nationkey" -> "nationkey"))
    copyKeyed("supplier", Map("s_suppkey" -> "suppkey",
      "s_nationkey" -> "nationkey"))
    copyKeyed("nation", Map("n_nationkey" -> "nationkey",
      "n_regionkey" -> "regionkey"))
    copyKeyed("region", Map("r_regionkey" -> "regionkey"))
  }

  /** Events copies for the s-group windows: event_id and user_id offset
    * per copy (disjoint user populations — each copy's per-user windows
    * replicate copy 0 exactly, so s9's true output grows linearly in m
    * and the timing isolates the keyed-window scaling); ts/type/value
    * ride through unchanged.
    */
  /** Part copies (j14/w-group): p_partkey offset to the partkey domain
    * (consistent with lineitem's l_partkey offsets); name/brand/type ride
    * through unchanged, so the name VOCABULARY is shared across copies —
    * j14's per-name counts grow ×m while its DP work stays constant, the
    * real-catalog regime (dup listings multiply faster than distinct
    * names). Additive with its own sentinel like [[buildEvents]].
    */
  private def buildPart(spark: SparkSession, src: String, dst: String,
      m: Int): Unit = {
    if (new java.io.File(s"$dst/part.parquet/_SUCCESS").exists()) return
    val t = spark.read.parquet(s"$src/part.parquet")
    val np = t.agg(max(col("p_partkey").cast("bigint"))).head().getLong(0) + 1
    (0 until m).map { i =>
      t.select(t.columns.map {
        case "p_partkey" =>
          (col("p_partkey").cast("bigint") + lit(i * np)).as("p_partkey")
        case c => col(c)
      }: _*)
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/part.parquet")
  }

  private def buildEvents(spark: SparkSession, src: String, dst: String,
      m: Int): Unit = {
    if (new java.io.File(s"$dst/events.parquet/_SUCCESS").exists()) return
    val ev = spark.read.parquet(s"$src/events.parquet")
    val neId = ev.agg(max("event_id")).head().getLong(0) + 1
    val nuId = ev.agg(max("user_id")).head().getLong(0) + 1
    (0 until m).map { i =>
      ev.select(((col("event_id") + lit(i * neId)).as("event_id")
        +: ev.columns.filter(_ != "event_id").map {
          case "user_id" => (col("user_id") + lit(i * nuId)).as("user_id")
          case c => col(c)
        }.toSeq): _*)
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
  }
}
