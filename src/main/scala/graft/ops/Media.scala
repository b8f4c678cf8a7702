package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Declared multimodal-column queries (SURVEY.md §2.8 m-group): the first
  * oracle-checkable surface over `graft.multimodal.Multimodal`'s opaque
  * binary columns + typed metadata (round-11 verdict item 4 — multimodal
  * was plumbing-only before these).
  *
  * The media table derives deterministic synthetic blobs from the documents
  * fixture (`encode(text)` — the container has no real media, SURVEY §0),
  * so every byte-level statistic the typed mapPartitions path computes
  * (blob length, MD5 fingerprint, frame slicing) is restatable by DuckDB
  * over the SAME parquet: `octet_length(encode(text))`, `md5(text)` (VARCHAR
  * md5 hashes the UTF-8 bytes — exactly the Spark-side `md5(content)` on a
  * UTF-8 payload), and integer frame arithmetic. The DECODE stays a stub
  * (FakeDecoder); everything these queries grade — schema, mapPartitions
  * batch shape, fingerprint/length math, shuffle-free decode placement — is
  * the real pipeline. Decoded-only outputs (brightness) are deliberately NOT
  * declared: they are stub values, and their float aggregation would need
  * the D-rule quantization for no capability coverage.
  *
  * Scale: one narrow pass per query (mapPartitions feature extraction is
  * per-row, no shuffle) followed by ONE keyed aggregation — blobs never
  * leave executor space and never reach a shuffle (only the extracted
  * metadata columns do; at 100 TB of media the shuffle moves ~50 bytes per
  * item, not the payload).
  */
object Media {

  /** m1 — per-kind media metadata rollup through the typed decode path:
    * item count, total/min/max blob bytes, distinct MD5 fingerprints.
    * The dataset-card shape a media-curation sweep emits first.
    */
  def m1(s: SparkSession, d: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.mediaFromDocuments(s, d))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("items"),
        sum(col("byte_len")).cast("bigint").as("total_bytes"),
        countDistinct(col("sig")).as("n_sigs"),
        min(col("byte_len")).as("min_bytes"),
        max(col("byte_len")).as("max_bytes"))
      .orderBy("kind")

  /** m2 — frame-sampling accounting for the video kind: frames are fixed
    * 64-byte slices of the blob (the stub for seek+decode sampling), so per
    * video `n_frames = ceil(bytes/64)` and the tail frame carries
    * `((bytes-1) mod 64) + 1` bytes. One flatMap (corpus-linear in blob
    * bytes) + one doc-keyed aggregation; the oracle states the same integer
    * arithmetic directly on `octet_length`.
    */
  def m2(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(Multimodal.mediaFromDocuments(s, d), 64)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("byte_len")).cast("bigint").as("total_bytes"),
        max_by(col("byte_len"), col("frame_idx")).as("last_frame_bytes"))
      .orderBy("doc_id")

  /** m3 — blob-prefix fingerprint groups (x58's media-side twin): MD5 of
    * the first 64 blob bytes keys a boilerplate-prefix account — groups of
    * ≥2 items sharing a prefix, with their full-fingerprint variant count
    * and kind spread. The fixture payload is pure ASCII (verified at build
    * time), so the oracle's `md5(substring(text,1,64))` states the same
    * 64 BYTES the Spark side takes from the blob; a non-ASCII corpus would
    * need a byte-slicing oracle (DuckDB md5/substring are VARCHAR-only).
    * Same shape as m1: narrow hash pass + one keyed agg, no joins.
    */
  /** m4 — MEDIA MIXTURE card: byte and item mass per (kind, lang) cell
    * with each cell's share of its kind's bytes — the multimodal twin of
    * x28/x46's text-mixture accounting (a media training mix is balanced
    * in BYTES, not items: audio/video blobs dwarf images). Language is a
    * typed metadata column ON the media row (the round's first cut joined
    * it back from documents by doc_id — PlanLintSpec flagged the
    * planner-chosen broadcast of that unreduced corpus frame; carrying
    * the label through the schema removes the join entirely, the right
    * call at 100 TB where media metadata always travels with the blob).
    * The share window runs on the AGGREGATED cell frame —
    * |kinds|×|langs| rows, domain-bounded.
    */
  def m4(s: SparkSession, d: String): DataFrame = {
    val cell = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(s, d))
      .groupBy(col("kind"), col("lang"))
      .agg(count(lit(1)).as("items"),
        sum(col("byte_len")).cast("bigint").as("total_bytes"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("kind")
    cell
      .withColumn("kind_bytes", sum(col("total_bytes")).over(w))
      .select(col("kind"), col("lang"), col("items"), col("total_bytes"),
        graft.Det.round4nz(col("total_bytes").cast("double")
          / col("kind_bytes").cast("double")).as("byte_share"))
      .orderBy("kind", "lang")
  }

  /** m5 — CHUNK-LEVEL media dedup card (x29's media-side twin, and the
    * content-addressed-storage accounting every blob store runs): blobs
    * are cut into aligned 64-byte chunks, each chunk MD5'd, and chunks
    * shared by ≥2 DISTINCT docs are reported with their occurrence count,
    * kind spread and reclaimable duplicate bytes (`(n_occ−1)·chunk_bytes`
    * — the mass a dedup store would not write twice). Full-blob exact
    * dedup is the degenerate case and is EMPTY on this fixture (no two
    * blobs are byte-identical — l1's singleton groups), so the chunk
    * level is where real media dedup lives: shared intros/boilerplate
    * slices surface here exactly as x58/x60 surface them on text.
    *
    * Scale: one narrow mapPartitions pass (hash while the blob is in
    * hand) + ONE sig-keyed agg; corpus-linear in blob bytes, no joins —
    * only (sig, idx, len) rows shuffle, never the payload.
    */
  def m5(s: SparkSession, d: String): DataFrame =
    Multimodal.chunkSignatures(Multimodal.mediaFromDocuments(s, d), 64)
      .groupBy(col("chunk_sig"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"),
        countDistinct(col("kind")).as("n_kinds"),
        min(col("doc_id")).as("first_doc"),
        // same sig ⇒ same bytes ⇒ same length: min is exact, not a choice
        min(col("byte_len")).as("chunk_bytes"),
        ((count(lit(1)) - 1) * min(col("byte_len"))).cast("bigint")
          .as("dup_bytes"))
      .filter(col("n_docs") >= 2)
      .orderBy("chunk_sig")

  /** m6 — per-kind blob-SIZE PROFILE: exact discrete quantiles (p25/p50/
    * p90) of byte length plus mean bytes per item — the storage-planning
    * card a media lake reads before choosing shard sizes and decode batch
    * shapes (a26's percentile_disc discipline on media metadata: the
    * quantile SELECTS an input value, so both engines return the same
    * integer and no float interpolation crosses the hash gate; the mean
    * is the l5 discipline — double division of exact integer sums, 4-dp
    * quantized).
    * Same scale shape as m1: metadata-only after the narrow extract pass,
    * one keyed agg over 3 groups.
    */
  def m6(s: SparkSession, d: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.mediaFromDocuments(s, d))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("items"),
        expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY byte_len) AS INT)")
          .as("p25_bytes"),
        expr("CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY byte_len) AS INT)")
          .as("p50_bytes"),
        expr("CAST(percentile_disc(0.90) WITHIN GROUP (ORDER BY byte_len) AS INT)")
          .as("p90_bytes"),
        graft.Det.round4nz(sum(col("byte_len")).cast("double")
          / count(lit(1)).cast("double")).as("mean_bytes"))
      .orderBy("kind")

  def m3(s: SparkSession, d: String): DataFrame =
    Multimodal.prefixSignatures(Multimodal.mediaFromDocuments(s, d), 64)
      .groupBy(col("prefix_sig"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("full_sig")).as("n_variants"),
        countDistinct(col("kind")).as("n_kinds"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy("prefix_sig")

  /** m7 — media EXACT-DUPLICATE keep list: one row per full-blob
    * fingerprint (l1's all-groups shape at the BLOB layer — dup_cnt 1
    * means unique): item count, distinct kinds carrying the payload, the
    * kept representative (min doc_id — l1/x25's deterministic survivor
    * rule), the item size, and the reclaimable duplicate bytes
    * ((n−1)·size; 0 for uniques). The content-addressed-storage gc
    * inventory m5's chunk dedup refines below whole-file granularity.
    *
    * Scale: the fingerprint is computed IN the scan partitions
    * (shuffle-free decode path — only the ~50-byte metadata row reaches
    * the sig-keyed agg, never the payload), and every aggregate is
    * map-side combinable. Output is bounded by distinct content, not
    * items.
    */
  def m7(s: SparkSession, d: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.mediaFromDocuments(s, d))
      .groupBy(col("sig"))
      .agg(count(lit(1)).as("n_items"),
        countDistinct(col("kind")).as("n_kinds"),
        min(col("doc_id")).as("keep_doc"),
        min(col("byte_len")).as("item_bytes"),
        ((count(lit(1)) - 1) * min(col("byte_len"))).cast("bigint")
          .as("dup_bytes"))
      .orderBy("sig")
}
