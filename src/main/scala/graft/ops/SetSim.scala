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

  /** |A ∩ B| for two encoded sets; `small` is the corpus-wide flag column. */
  def interCol: Column =
    when(col("small"),
      expr("cast(bit_count(a_set[0] & b_set[0]) as int)"))
      .otherwise(size(array_intersect(col("a_set"), col("b_set"))))

  /** Block-decomposed all-pairs self-join within `lang` buckets over an
    * encoded set frame; emits (lang, a_id, b_id, inter, uni).
    */
  def pairs(enc: DataFrame, blocks: Int): DataFrame = {
    val a = enc.select(col("doc_id").as("a_id"), col("lang"), col("small"),
        col("set").as("a_set"), col("sz").as("a_sz"))
      .withColumn("blk", (col("a_id") % blocks).cast("int"))
    val b = enc.select(col("doc_id").as("b_id"), col("lang").as("lang_b"),
        col("set").as("b_set"), col("sz").as("b_sz"))
      .withColumn("blk_b", explode(sequence(lit(0), lit(blocks - 1))))
    a.join(b, col("lang") === col("lang_b") && col("blk") === col("blk_b")
        && col("a_id") < col("b_id"))
      .withColumn("inter", interCol)
      .withColumn("uni", col("a_sz") + col("b_sz") - col("inter"))
      .select(col("lang"), col("a_id"), col("b_id"), col("inter"), col("uni"))
  }
}
