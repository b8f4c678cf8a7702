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

  /** The LIGHT sharing tool for single-pass, multi-consumer, DETERMINISTIC
    * frames: a lazy `persist(MEMORY_AND_DISK)`. Where [[apply]] cuts
    * lineage with an EAGER materialization (required for iterative loops
    * and for frames whose recomputation could legally differ — sampled
    * range boundaries), `shared` only dedups computation across consumers
    * whose renamed references defeat ReuseExchange: the first action
    * computes the subtree once, later consumers read the cache, nothing
    * blocks the driver and no extra materialization job runs. Round-15
    * motivation (r14-verdict item 2/3): the x1Sig-family eager Ckpts cost
    * two serial barrier jobs per query before the main job graph even
    * started, and the driver's bench read x1 +17%, x17 +22%, x59 +39%,
    * x21 +20% vs the un-Ckpt'd round-13 shape — the barriers exceeded the
    * duplicated-subtree saving at sf0.1, while DROPPING the dedup would
    * re-pay the duplicated corpus subtree at 100 TB. Lazy persist keeps
    * the single-subtree plan at any scale and removes the barrier cost.
    * Only for frames whose recomputation is bit-deterministic (partition
    * loss under MEMORY_AND_DISK recomputes lineage); iterative rounds
    * keep [[apply]].
    */
  def shared(df: DataFrame): DataFrame =
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Co-location variant of [[shared]] for LOOP-INVARIANT frames that every
    * round of an iterative operator joins/aggregates on the same key:
    * shuffle ONCE into hash partitioning on `keys` (width = the session's
    * shuffle parallelism — scale-parameterized, never a constant), cache,
    * and MATERIALIZE eagerly. InMemoryRelation preserves the cached plan's
    * outputPartitioning, so every round planned AFTER materialization
    * satisfies its keyed distribution requirement with NO exchange — only
    * the small evolving side (frontier / labels / bitmaps / ranks)
    * shuffles per round. This is the r14-verdict item-5 scheme ("shuffle
    * the bitmap side, not the 2|E| edge frame"), generalized to the whole
    * iterative family. [[apply]] cannot express it: Spark 4.1's
    * Dataset.checkpoint/localCheckpoint DROPS outputPartitioning
    * (measured — ProbePartCkpt shows an ENSURE_REQUIREMENTS Exchange above
    * the Ckpt'd scan for plain, column- and explicit-N-repartitioned
    * variants alike), which is exactly why the round-14 loops re-shuffled
    * their edge frames every round. The eager materialization is required
    * for the partitioning to be visible (an unmaterialized cache reports
    * the adaptive plan's not-yet-final partitioning) and costs one
    * column-pruned count job — the same barrier class every Ckpt pays.
    */
  def sharedBy(df: DataFrame,
      keys: org.apache.spark.sql.Column*): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val out = shared(df.repartition(n, keys: _*))
    out.count() // build the cache so consumers plan against FINAL partitioning
    out
  }
}
