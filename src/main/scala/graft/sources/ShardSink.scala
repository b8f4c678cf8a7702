package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SHARD SINK — materializes `x27`'s shard-pack manifest as the physical
  * training layout a trainer streams: one parquet partition directory per
  * shard (`shard=<id>/`), each holding ONE file whose rows sit in
  * curriculum order (quality desc, doc_id), with the document payload
  * riding along. x27 computes WHERE every document goes; this writes the
  * files — the manifest→files gap a real training run hits first.
  *
  * Scale shape:
  *  - the payload join is ONE doc_id-keyed equi-join of the narrow
  *    manifest against the corpus (no broadcast hint — AQE decides; the
  *    manifest side is corpus-sized);
  *  - `repartition($"shard")` gives each output task a whole number of
  *    shards (hash on the shard id), so `partitionBy("shard")` emits
  *    exactly ONE file per shard directory — a trainer reads a shard as
  *    one sequential file, and the file count is the shard count, not
  *    shard count × task count (the small-files explosion the naive
  *    unrepartitioned write produces);
  *  - `sortWithinPartitions(shard, quality desc, doc_id)` orders rows
  *    inside each task so every shard FILE is written in curriculum
  *    order — parquet preserves row order, so no read-side sort;
  *  - shards per task is bounded by total shards / parallelism; a shard
  *    itself is bounded by the fixed token budget, so task memory is flat
  *    at any corpus size.
  */
object ShardSink {

  /** x27's manifest joined back to the document payload — the frame a
    * trainer actually reads. Keyed doc_id equi-join; both sides
    * corpus-sized and narrow. */
  def pack(s: SparkSession, d: String): DataFrame =
    graft.ops.Pipeline.x27(s, d).join(
      graft.Tables.documents(s, d).select(col("doc_id"), col("text")),
      Seq("doc_id"))

  /** Write `packed` (x27 output + payload) as one ordered parquet file per
    * `shard=<id>/` directory under `path`. */
  def write(packed: DataFrame, path: String): Unit =
    packed
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("quality").desc, col("doc_id"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Read ONE shard back in its written (curriculum) order: the shard is a
    * single file by construction and far under
    * `spark.sql.files.maxPartitionBytes`, so it maps to one input split
    * and parquet hands rows back in file order — no sort. Reading via the
    * root with a `shard = k` filter instead prunes to the same directory
    * (BucketingSpec-style partition pruning) but Spark does not promise
    * row order across splits, so the trainer path reads the directory. */
  def readShard(spark: SparkSession, path: String, shard: Long): DataFrame =
    spark.read.parquet(s"$path/shard=$shard")
}
