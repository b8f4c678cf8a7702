package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.DotProduct.{dot => vdot}

/** Deterministic Lloyd's k-means over an embedding column — the LEARNED
  * codebook for IVF-style ANN (`Pipeline.x11` uses the vec_id < k identity
  * codebook so the oracle can mirror it; swap in `train`'s output when
  * recall matters more than oracle checkability, or [[trainMirrored]]'s
  * when BOTH matter — the declared `x21_semdedup_learned` query mirrors a
  * full 2-iteration Lloyd training as a DuckDB CTE chain).
  *
  * Every step is expressed against Spark's distributed ops and stays
  * deterministic:
  *  - init: the k vectors with the smallest ids (no RNG — reproducible
  *    across engines and runs; k-means|| would replace only this step);
  *  - assignment: crossJoin against the BROADCAST codebook (k rows), then
  *    argmin by `min(struct(dist, cent_id))` — lexicographic struct min
  *    gives an exact deterministic tie-break, one keyed aggregation, no
  *    window;
  *  - update: per-dimension means via posexplode + groupBy(cell, pos) —
  *    a keyed shuffle whose width is k×dims rows. Each component is
  *    quantized to DECIMAL(27,14) BEFORE the sum (rule D2: a decimal sum
  *    is exact, so its value is independent of partial-aggregation order —
  *    `avg` over raw doubles is not) and divided once; the new centroid
  *    arrays are reassembled in pos order (sort_array on (pos, mean)
  *    structs, unique pos ⇒ total order ⇒ deterministic);
  *  - a cell that receives no vectors this round RETAINS its previous
  *    centroid (left join + coalesce onto the prior codebook), so train()
  *    always returns exactly k centroids;
  *  - the per-iteration centroid frame is `localCheckpoint`ed to truncate
  *    the growing lineage (same idiom as [[DedupCluster]]).
  *
  * The driver never materializes vectors — only the k×dims codebook, which
  * is by construction tiny (it is broadcast anyway).
  *
  * Scale bound (honest limit): the broadcast-assign shape holds while
  * k×dims×8B stays broadcast-sized — k up to ~10⁵ at 64 dims (~50 MB).
  * A 100 TB corpus targeting constant cell populations wants k beyond
  * that; the standard fix is a TWO-LEVEL codebook (assign to ~10³ coarse
  * cells by broadcast, then train/assign fine centroids per coarse cell —
  * each broadcast stays bounded), which composes from this trainer run
  * per coarse partition. Not implemented here: the fixture k is 16 and
  * the declared contract (x21_semdedup_learned) exercises the mirrored
  * math, not the two-level scheduling.
  */
object KMeansCodebook {

  /** e: (id, emb: array<double>). Returns the trained codebook
    * (cent_id, cent_emb) after `iters` Lloyd rounds, k centroids.
    */
  def train(e: DataFrame, k: Int, iters: Int): DataFrame =
    trainImpl(e, k, iters, mirrored = false)

  /** The ORACLE-MIRRORABLE trainer (declared `x21_semdedup_learned` path).
    * Two deltas vs [[train]], both so every intermediate is bit-identical
    * on any engine rather than merely deterministic within Spark:
    *  - the assignment argmin key is the 4-dp-ROUNDED squared distance
    *    (raw doubles agree across engines only to ~1 ulp because the
    *    64-term reduction order is engine-specific; rounding gives both
    *    engines the same key, and the cent_id tie-break resolves the
    *    coarser ties identically);
    *  - the centroid mean casts the EXACT decimal component sum to double
    *    BEFORE the count division (double/int division is correctly
    *    rounded by IEEE 754 — engine-independent — while decimal division
    *    precision/scale rules differ between engines).
    */
  def trainMirrored(e: DataFrame, k: Int, iters: Int): DataFrame =
    trainImpl(e, k, iters, mirrored = true)

  private def trainImpl(e: DataFrame, k: Int, iters: Int,
      mirrored: Boolean): DataFrame = {
    val vecs = e.select(col("id"), col("emb"))
    var codebook = vecs.orderBy("id").limit(k)
      .select(col("id").as("cent_id"), col("emb").as("cent_emb"))
      .localCheckpoint()
    (0 until iters).foreach { _ =>
      val means = meansStep(assignImpl(vecs, codebook, mirrored), vecs, mirrored)
      codebook = codebook.join(means, Seq("cent_id"), "left")
        .select(col("cent_id"),
          coalesce(col("new_emb"), col("cent_emb")).as("cent_emb"))
        .localCheckpoint()
    }
    codebook
  }

  /** Per-cell per-dimension centroid means, UN-checkpointed — exposed so
    * PlanLintSpec can lint the trainer shape the per-iteration checkpoints
    * hide from whole-query plans. */
  private[graft] def meansStep(assigned: DataFrame, vecs: DataFrame,
      mirrored: Boolean): DataFrame = {
    val compSum = sum(col("v").cast("decimal(27,14)"))
    val mean =
      if (mirrored) compSum.cast("double") / count(lit(1))
      else (compSum / count(lit(1))).cast("double")
    assigned.join(vecs, "id")
      .select(col("cell"), posexplode(col("emb")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg(mean.as("m"))
      .groupBy(col("cell"))
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell").as("cent_id"),
        expr("transform(pm, x -> x.m)").as("new_emb"))
  }

  /** Nearest-centroid assignment: (id, cell, dist2). Squared L2, broadcast
    * codebook, deterministic argmin tie-broken by cent_id.
    */
  def assign(vecs: DataFrame, codebook: DataFrame): DataFrame =
    assignImpl(vecs, codebook, mirrored = false)

  private def assignImpl(vecs: DataFrame, codebook: DataFrame,
      mirrored: Boolean): DataFrame = {
    val diff = expr("zip_with(emb, cent_emb, (a, b) -> a - b)")
    val d2 = vdot(col("d"), col("d"))
    vecs.crossJoin(broadcast(codebook))
      .withColumn("d", diff)
      .withColumn("dist2", if (mirrored) graft.Det.round4nz(d2) else d2)
      .groupBy(col("id"))
      .agg(min(struct(col("dist2"), col("cent_id"))).as("best"))
      .select(col("id"), col("best.cent_id").as("cell"),
        col("best.dist2").as("dist2"))
  }

  /** Within-cluster sum of squared distances for a given codebook — the
    * Lloyd objective; must be non-increasing over iterations.
    */
  def sse(vecs: DataFrame, codebook: DataFrame): Double =
    assign(vecs, codebook).agg(sum(col("dist2"))).head().getDouble(0)
}
