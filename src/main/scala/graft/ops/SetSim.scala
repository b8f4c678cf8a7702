package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared set-similarity machinery for the near-dup operators (l2, x1, x3).
  *
  * Two representations of a document's token set, chosen by vocabulary size:
  *  - vocab ≤ 63 → one int64 BITMASK per doc; |∩| = bit_count(a & b). The
  *    pairwise step becomes three ALU ops — no arrays, no hashing.
  *  - otherwise → dictionary-encoded int arrays (ints hash/compare far
  *    cheaper than the original strings in array_intersect).
  * Either way |∪| = |A| + |B| − |∩| (exact integer math; same value as
  * size(array_union) on distinct arrays, which the DuckDB oracle uses).
  *
  * Scale notes: the dictionary is tiny relative to the corpus (vocabulary,
  * not occurrences) and is broadcast; the global row_number that assigns ids
  * is a single-partition sort of the VOCABULARY only — at 100 TB swap it for
  * a precomputed vocabulary table, the per-doc side is unchanged. The
  * pairwise self-join is block-decomposed (one side tagged id%B, the other
  * replicated over B blocks) so the shuffle key is (bucket, block) and
  * parallelism is buckets×B instead of |buckets|.
  */
private[graft] object SetSim {

  /** Encode (doc_id, lang, toks:array<string>) → (doc_id, lang, set, sz).
    * Returns the encoded frame and whether `set` is a bitmask (vs int array).
    */
  def tokenSets(t: DataFrame): (DataFrame, Boolean) = {
    val dict = t.select(explode(col("toks")).as("tok")).distinct()
    val useMask = dict.count() <= 63
    val enc =
      if (useMask) {
        val bits = dict.withColumn("bit",
          row_number().over(Window.orderBy("tok")) - 1)
        t.select(col("doc_id"), col("lang"), explode(col("toks")).as("tok"))
          .join(broadcast(bits), "tok")
          .groupBy(col("doc_id"), col("lang"))
          .agg(sum(expr("cast(pow(2, bit) as bigint)")).as("set"))
          .withColumn("sz", expr("cast(bit_count(set) as int)"))
      } else {
        val ids = dict.withColumn("gid",
          row_number().over(Window.orderBy("tok")))
        t.select(col("doc_id"), col("lang"), explode(col("toks")).as("tok"))
          .join(broadcast(ids), "tok")
          .groupBy(col("doc_id"), col("lang"))
          .agg(collect_list(col("gid")).as("set"),
            count(lit(1)).cast("int").as("sz"))
      }
    (enc, useMask)
  }

  def interCol(useMask: Boolean): Column =
    if (useMask) expr("cast(bit_count(a_set & b_set) as int)")
    else size(array_intersect(col("a_set"), col("b_set")))

  /** Block-decomposed all-pairs self-join within `lang` buckets over an
    * encoded set frame; emits (lang, a_id, b_id, inter, uni).
    */
  def pairs(enc: DataFrame, useMask: Boolean, blocks: Int): DataFrame = {
    val a = enc.select(col("doc_id").as("a_id"), col("lang"),
        col("set").as("a_set"), col("sz").as("a_sz"))
      .withColumn("blk", (col("a_id") % blocks).cast("int"))
    val b = enc.select(col("doc_id").as("b_id"), col("lang").as("lang_b"),
        col("set").as("b_set"), col("sz").as("b_sz"))
      .withColumn("blk_b", explode(sequence(lit(0), lit(blocks - 1))))
    a.join(b, col("lang") === col("lang_b") && col("blk") === col("blk_b")
        && col("a_id") < col("b_id"))
      .withColumn("inter", interCol(useMask))
      .withColumn("uni", col("a_sz") + col("b_sz") - col("inter"))
      .select(col("lang"), col("a_id"), col("b_id"), col("inter"), col("uni"))
  }
}
