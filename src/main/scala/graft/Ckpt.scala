package graft

import org.apache.spark.sql.DataFrame

/** THE lineage-truncation point for every iterative operator (x20's CC
  * rounds, x27's sampled range cells, r7's edge frame, the k-means
  * trainers, DedupCluster's fixpoint loop).
  *
  * Strategy is picked from session state, not hard-coded at each site:
  *  - when `SparkContext.getCheckpointDir` is SET (a cluster run that
  *    configured a reliable checkpoint location — HDFS/object store),
  *    use a reliable eager `checkpoint()`: the materialized frame
  *    survives executor loss, which `localCheckpoint` does not (losing
  *    one executor would otherwise kill a long CC/PageRank job at
  *    iteration N with no way to recompute the truncated lineage);
  *  - otherwise (local[*], tests, the bench harness) use eager
  *    `localCheckpoint`: executor storage IS driver storage in one JVM,
  *    so reliability adds only disk round-trips.
  *
  * Both paths are EAGER — every call site relies on
  * materialize-exactly-once semantics (the shortcut/offsets subtrees
  * reference their input twice; re-deriving a SAMPLED range assignment
  * could legally observe a different sampling). CkptSpec runs the
  * iterative queries under a configured checkpoint dir and asserts
  * byte-identical results vs the local path.
  */
object Ckpt {
  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}
