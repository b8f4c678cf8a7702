package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared set-similarity machinery for the near-dup operators (l2, x1, x3).
  *
  * Two representations of a document's token set, chosen INSIDE the plan
  * (building a query triggers zero Spark jobs — the round-1 version ran an
  * eager `dict.count()` plus a single-partition vocabulary sort here):
  *  - small vocabulary (≤ 63 distinct tokens corpus-wide) → one int64
  *    BITMASK per doc; |∩| = bit_count(a & b), three ALU ops per pair.
  *  - otherwise → sorted arrays of xxhash64 token ids (no dictionary frame
  *    at all; 64-bit ids hash/compare far cheaper than the strings, and a
  *    collision inside one comparison is a 2^-64 event).
  * Either way |∪| = |A| + |B| − |∩| (exact integer math; same value as
  * size(array_union) on distinct arrays, which the DuckDB oracle uses).
  *
  * The vocabulary probe is `distinct().limit(64)`: distributed, memory-
  * bounded (at most 64 rows ever reach the driver-side of the plan — it is
  * a broadcast one-row aggregate, not a collect), and exact for the ≤63
  * decision: 64 collected tokens ⇒ the vocab is too big, use hashing. Both
  * encodings are computed per doc (cheap, one narrow pass) and the final
  * `set` column picks per the corpus-wide flag, so the choice lives in the
  * plan, not in driver control flow.
  *
  * Scale notes: the pairwise self-join is block-decomposed (one side tagged
  * id%B, the other replicated over B blocks) so the shuffle key is
  * (bucket, block) and parallelism is buckets×B instead of |buckets|.
  */
private[graft] object SetSim {

  /** Encode (doc_id, lang, toks:array<string>) →
    * (doc_id, lang, small, set:array<long>, sz). `small` is corpus-constant;
    * when true, `set` is a 1-element array holding the bitmask.
    */
  def tokenSets(t: DataFrame): DataFrame = {
    val vocabRow = t.select(explode(col("toks")).as("tok"))
      .distinct().limit(64)
      .agg(sort_array(collect_set(col("tok"))).as("varr"))
    t.select(col("doc_id"), col("lang"), explode(col("toks")).as("tok"))
      .crossJoin(broadcast(vocabRow))
      .withColumn("small", size(col("varr")) <= 63)
      .withColumn("bit",
        when(col("small"), array_position(col("varr"), col("tok")) - 1))
      .withColumn("hid", xxhash64(col("tok")))
      .groupBy(col("doc_id"), col("lang"), col("small"))
      .agg(
        sum(when(col("small"), expr("cast(pow(2, bit) as bigint)"))).as("mask"),
        sort_array(collect_set(col("hid"))).as("harr"),
        count(lit(1)).cast("int").as("sz"))
      .withColumn("set", when(col("small"), array(col("mask"))).otherwise(col("harr")))
      .select(col("doc_id"), col("lang"), col("small"), col("set"), col("sz"))
  }

  /** |A ∩ B| for two encoded sets; `small` is the corpus-wide flag column.
    * The hashed branch is a codegen'd single merge pass
    * ([[graft.functions.SortedIntersectCount]] — the arrays are
    * sort_array(collect_set(..)) outputs, so sorted + distinct by
    * construction): `size(array_intersect(..))` builds a hash set and an
    * output array PER PAIR, which at 10M+ candidates was the dominant cost
    * of x1's verify (ProbeX1, BASELINE.md round-7 scale table). */
  def interCol: Column =
    when(col("small"),
      expr("cast(bit_count(a_set[0] & b_set[0]) as int)"))
      .otherwise(graft.functions.SortedIntersectCount.sortedIntersectCount(
        col("a_set"), col("b_set")))

  /** Prefix-filtered candidate pairs for a Jaccard threshold num/den
    * (PPJoin-family, EXACT recall — no pair at or above the threshold is
    * missed): under a global token order by (document frequency asc, token),
    * any pair with j >= t shares its minimal common token within both
    * docs' first sz − ⌈t·sz⌉ + 1 tokens, so joining only those prefix
    * postings on (lang, token) yields a candidate superset of the answer.
    * Rare tokens form the prefixes, so posting lists — and the join work —
    * are the SMALLEST lists, the opposite of the hot-key failure mode.
    * All shuffles keyed (df agg, prefix join, distinct); never all-pairs.
    */
  def prefixCandidates(t: DataFrame, num: Int, den: Int): DataFrame = {
    val ex = t.select(col("doc_id"), col("lang"), explode(col("toks")).as("tok"))
    val dfc = ex.groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("df"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("lang"))
    val ranked = ex.join(dfc, Seq("lang", "tok"))
      .withColumn("rk", row_number().over(
        wDoc.orderBy(col("df"), col("tok"))))
      .withColumn("sz", count(lit(1)).over(wDoc))
    // prefix length = sz − ⌈(num/den)·sz⌉ + 1   (integer ceil)
    val prefix = ranked
      .filter(col("rk") <= col("sz") - ((col("sz") * num + den - 1)
        .divide(den).cast("long")) + 1)
      .select(col("doc_id"), col("lang"), col("tok"), col("rk"), col("sz"))
    val pa = prefix.select(col("lang"), col("tok"), col("doc_id").as("a_id"),
      col("rk").as("a_rk"), col("sz").as("a_sz"))
    val pb = prefix.select(col("lang").as("lang_b"), col("tok").as("tok_b"),
      col("doc_id").as("b_id"), col("rk").as("b_rk"), col("sz").as("b_sz"))
    // PPJoin positional filter: a qualifying pair needs overlap
    // α = ⌈num/(num+den)·(szA+szB)⌉, and a match at prefix positions
    // (a_rk, b_rk) caps the achievable overlap at
    // min(szA − a_rk, szB − b_rk) + 1 — prune during the probe, before the
    // candidate ever reaches the DISTINCT.
    val alpha = ((col("a_sz") + col("b_sz")) * num + (num + den) - 1)
      .divide(num + den).cast("long")
    val posOk =
      least(col("a_sz") - col("a_rk"), col("b_sz") - col("b_rk")) + 1 >= alpha
    pa.join(pb, col("lang") === col("lang_b") && col("tok") === col("tok_b")
        && col("a_id") < col("b_id") && posOk)
      .select(col("lang"), col("a_id"), col("b_id")).distinct()
  }

  /** [[pairs]]' misuse fuse (r10-verdict item 5): the exact pairwise path
    * is O(bucket²) BY DECLARED SEMANTICS — correct as the downstream
    * verify primitive on candidate buckets, corpus-suicide as a corpus-
    * wide driver (l2's measured 26× at 8× is the curve). Above this
    * per-bucket size the job fails LOUDLY instead of grinding: 10⁵ docs
    * in one bucket is ~5·10⁹ comparisons — past any defensible use of
    * the exact path, and the error names the sublinear operators to use
    * (x1 MinHash/LSH, x3 PPJoin, x10 SimHash). Callers with a measured
    * reason can raise the cap explicitly.
    */
  val DefaultMaxBucket = 100000L

  /** Block-decomposed all-pairs self-join within `lang` buckets over an
    * encoded set frame; emits (lang, a_id, b_id, inter, uni).
    *
    * Guarded: any bucket larger than `maxBucket` fails the job with a
    * loud pointer at the corpus-scale operators (see [[DefaultMaxBucket]]).
    * The guard is one lang-keyed count joined back and an `assert_true`
    * filter — corpus-LINEAR, evaluated before any pair is enumerated, and
    * a no-op filter (null check on a non-error constant) when sizes are
    * legal, so the declared l2 output is untouched.
    */
  def pairs(enc: DataFrame, blocks: Int,
      maxBucket: Long = DefaultMaxBucket): DataFrame = {
    // Explicit round-robin fan-out of the probe side: the encoded frame is
    // tiny (one row per doc), so AQE coalesces it to ~1 partition — and the
    // join's quadratic pair OUTPUT would then be enumerated by one task.
    // REPARTITION_BY_NUM is exempt from AQE coalescing.
    val shufP = enc.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // the assert evaluates once per BUCKET (≤ |langs| rows), and the
    // broadcast identity join back (every lang appears in sizes) forces
    // the guard subtree into the executed plan without per-row work
    val sizes = enc.groupBy(col("lang"))
      .agg(count(lit(1)).as("graft_bucket_n"))
      .filter(assert_true(col("graft_bucket_n") <= maxBucket,
        concat(lit("SetSim.pairs: exact pairwise bucket '"), col("lang"),
          lit("' holds "), col("graft_bucket_n"),
          lit(s" docs (> $maxBucket): the O(bucket²) exact path is a " +
            "verify primitive, not a corpus driver - generate candidates " +
            "with x1 (MinHash/LSH), x3 (PPJoin prefix) or x10 (SimHash), " +
            "or raise maxBucket explicitly with a measured reason"))).isNull)
    // BOTH sides derive from the guarded frame (round-11 ADVICE item 2):
    // correctness only needs the assert subtree to execute once, but with
    // a single guarded edge the fuse's presence hinged on that one join —
    // a future rebase of side `a` onto raw `enc` would have silently
    // deleted it. Symmetric derivation makes the guard structural, and
    // OperatorSpec asserts the executed plan retains the raise_error
    // subtree. Cost: the broadcast identity join to the ≤|langs|-row
    // sizes frame, now on two edges instead of one.
    val guarded = enc.join(sizes, Seq("lang")).drop("graft_bucket_n")
    val a = guarded.select(col("doc_id").as("a_id"), col("lang"), col("small"),
        col("set").as("a_set"), col("sz").as("a_sz"))
      .withColumn("blk", (col("a_id") % blocks).cast("int"))
      .repartition(shufP)
    val b = guarded.select(col("doc_id").as("b_id"), col("lang").as("lang_b"),
        col("set").as("b_set"), col("sz").as("b_sz"))
      .withColumn("blk_b", explode(sequence(lit(0), lit(blocks - 1))))
    a.join(b, col("lang") === col("lang_b") && col("blk") === col("blk_b")
        && col("a_id") < col("b_id"))
      .withColumn("inter", interCol)
      .withColumn("uni", col("a_sz") + col("b_sz") - col("inter"))
      .select(col("lang"), col("a_id"), col("b_id"), col("inter"), col("uni"))
  }
}
