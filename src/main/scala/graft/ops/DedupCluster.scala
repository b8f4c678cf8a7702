package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTERING: turn a pair list (a_id, b_id) into connected
  * components so each duplicate group keeps one canonical survivor — the
  * step after l2/x1/x3/x10 in a real dedup pipeline.
  *
  * Algorithm: iterative min-label propagation with a pointer-doubling
  * SHORTCUT (each node adopts the smallest label in its 1-hop
  * neighbourhood, then jumps through its label: lbl ← lbl(lbl) — the
  * hook+shortcut shape `Pipeline.x20` unrolls with a fixed round count).
  * Every iteration is three keyed shuffles (neighbour join + groupBy-min +
  * label-lookup join) over materialized frames; fixpoint when no label
  * changes. The shortcut makes rounds-to-converge O(log diameter) instead
  * of O(diameter) — on a long duplicate chain (the shape big corpora
  * actually produce) that is the difference between 20 and a million
  * driver round-trips. The driver only ever sees the per-round change
  * COUNT (one long), never the data.
  */
object DedupCluster {

  /** pairs: (a_id, b_id) edges. Returns (doc_id, cluster_id) where
    * cluster_id = min doc id of the component; singletons excluded (they are
    * their own survivor).
    */
  def components(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // Materialize the symmetrized edge frame ONCE, hash-partitioned on the
    // hook join's key (round-15, guide §2.4 co-location): EVERY round's
    // hook join reads it, and without the truncation each round would
    // re-execute the caller's whole pair-generation subtree (r18's
    // order-local explode + support agg ran once per round — 16.5 s
    // isolated; materialized once it reads 2.6 s). Ckpt.sharedBy
    // additionally pins src-hash partitioning so the per-round hook join
    // shuffles only the (|V|-sized) label frame, never the 2·|E| edges —
    // localCheckpoint drops outputPartitioning and re-shuffled the edges
    // every round (measured, ProbePartCkpt).
    val edges = graft.Ckpt.sharedBy(
      pairs.select(col("a_id").cast("long").as("src"),
          col("b_id").cast("long").as("dst"))
        .union(pairs.select(col("b_id").cast("long").as("src"),
          col("a_id").cast("long").as("dst")))
        .distinct(), col("src"))
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    // Convergence probe state: every step only ever DECREASES a node's
    // label (hook takes min over a set containing the node's own label;
    // shortcut jumps lbl ← lbl(lbl) ≤ lbl), so Σ label is strictly
    // decreasing until the fixpoint and UNCHANGED exactly at it. Tracking
    // the sum turns the per-round convergence check from a keyed
    // next⋈old join + filter + count into ONE 1-row aggregate over the
    // already-materialized frame (round-14 optimization, guide §1.2 —
    // the join bought nothing the monotone invariant doesn't give).
    // DECIMAL(38,0) keeps the sum exact at any id magnitude.
    var labelSum: java.math.BigDecimal = null
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // hook: each node proposes its label to its neighbours; adopt the min
      val proposals = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("label"))
      // Ckpt truncates the growing iteration lineage (otherwise round
      // N's plan contains all prior rounds and optimization blows up
      // exponentially) and lets the shortcut reference the hooked frame
      // twice without doubling its subtree; reliable checkpoint when a
      // checkpoint dir is configured, localCheckpoint otherwise.
      val hooked = labels.select(col("id"), col("label"))
        .union(proposals)
        .groupBy("id").agg(min("label").as("label"))
        .transform(graft.Ckpt.apply)
      // shortcut (pointer doubling): lbl ← lbl(lbl). Labels name nodes
      // that carry labels themselves (they are ids seen in the edge list),
      // so the lookup join preserves every row; lbl(u) ≤ u invariantly,
      // so the jump only ever decreases a label within its component.
      val next = hooked
        .join(hooked.select(col("id").as("via"), col("label").as("l2")),
          col("label") === col("via"))
        .select(col("id"), col("l2").as("label"))
        .transform(graft.Ckpt.apply)
      val sumNow = next
        .agg(coalesce(sum(col("label").cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO)).as("s"))
        .head().getDecimal(0)
      labels = next
      converged = labelSum != null && sumNow.compareTo(labelSum) == 0
      labelSum = sumNow
      i += 1
    }
    if (!converged) {
      // An unconverged result has nodes still carrying non-minimal labels —
      // clusters silently split and survivors() would keep extra duplicates.
      throw new IllegalStateException(
        s"DedupCluster.components did not converge after $maxIters iterations; " +
          "raise maxIters (rounds needed = component diameter)")
    }
    labels
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .orderBy("doc_id")
  }

  /** Survivors after clustering: one row per cluster (its min id) plus every
    * document that was in no near-dup pair at all.
    */
  def survivors(spark: SparkSession, dir: String, pairs: DataFrame): DataFrame = {
    val comp = components(pairs)
    val dropped = comp.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    graft.Tables.documents(spark, dir).select(col("doc_id"))
      .join(dropped, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }
}
