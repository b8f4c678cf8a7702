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
  *  - the per-iteration centroid frame is materialized via [[graft.Ckpt]]
  *    to truncate the growing lineage (same idiom as [[DedupCluster]]).
  *
  * The driver never materializes vectors — only the k×dims codebook, which
  * is by construction tiny (it is broadcast anyway).
  *
  * Scale bound: the broadcast-assign shape holds while k×dims×8B stays
  * broadcast-sized — k up to ~10⁵ at 64 dims (~50 MB). A 100 TB corpus
  * targeting constant cell populations wants k beyond that;
  * [[trainHierarchical]] is that path — a coarse broadcast level plus a
  * fine level whose assignment is a KEYED join on the coarse cell, so the
  * k1×k2 fine codebook is never broadcast and total k scales past the
  * broadcast limit. The declared contract (x21_semdedup_learned)
  * exercises the mirrored flat trainer; the hierarchical trainer is the
  * capability tier above it (KMeansSpec-tested).
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
    var codebook = graft.Ckpt(vecs.orderBy("id").limit(k)
      .select(col("id").as("cent_id"), col("emb").as("cent_emb")))
    (0 until iters).foreach { _ =>
      val means = meansStep(assignImpl(vecs, codebook, mirrored), vecs, mirrored)
      codebook = graft.Ckpt(codebook.join(means, Seq("cent_id"), "left")
        .select(col("cent_id"),
          coalesce(col("new_emb"), col("cent_emb")).as("cent_emb")))
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

  /** TWO-LEVEL codebook training — the k-beyond-broadcast path. Level 1:
    * a flat k1-centroid codebook (broadcast assign, k1 small). Level 2:
    * k2 fine centroids trained WITHIN each coarse cell, all cells in one
    * distributed pass per iteration:
    *  - init: the k2 smallest vector ids of each cell (one keyed window);
    *  - assignment: vectors join the fine centroids OF THEIR OWN COARSE
    *    CELL — a keyed equi-join on `cell` (never a broadcast of the
    *    k1×k2 codebook), producing ≤ k2 candidate rows per vector, then
    *    one keyed argmin (same deterministic struct-min as [[assign]]);
    *  - update: decimal-exact per-(cell, fine_id, pos) means, empty fine
    *    cells retain their previous centroid (the [[train]] invariants).
    *
    * Returns (cell, fine_id, fine_emb): k2 centroids per coarse cell.
    * The per-iteration shuffles are all keyed on cell or (cell, fine_id) —
    * corpus-linear with bounded fan-out k2 — so total k = k1×k2 scales
    * with executor count, not with what fits in one broadcast.
    */
  def trainHierarchical(e: DataFrame, k1: Int, k2: Int,
      iters: Int): DataFrame = {
    val coarse = train(e, k1, iters)
    val withCell = graft.Ckpt(assign(e.select(col("id"), col("emb")), coarse)
      .select(col("id"), col("cell"))
      .join(e.select(col("id"), col("emb")), "id"))
    val wCell = org.apache.spark.sql.expressions.Window
      .partitionBy("cell").orderBy("id")
    var fine = graft.Ckpt(withCell.withColumn("rn", row_number().over(wCell))
      .filter(col("rn") <= k2)
      .select(col("cell"), col("id").as("fine_id"), col("emb").as("fine_emb")))
    (0 until iters).foreach { _ =>
      val asgn = withCell.join(fine, "cell") // keyed, NOT broadcast-hinted
        .withColumn("d", expr("zip_with(emb, fine_emb, (a, b) -> a - b)"))
        .withColumn("dist2", vdot(col("d"), col("d")))
        .groupBy(col("id"), col("cell"))
        .agg(min(struct(col("dist2"), col("fine_id"))).as("best"))
        .select(col("id"), col("cell"), col("best.fine_id").as("fine_id"))
      val means = asgn.join(withCell.select(col("id"), col("emb")), "id")
        .select(col("cell"), col("fine_id"),
          posexplode(col("emb")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("fine_id"), col("pos"))
        .agg((sum(col("v").cast("decimal(27,14)")) / count(lit(1)))
          .cast("double").as("m"))
        .groupBy(col("cell"), col("fine_id"))
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), col("fine_id"),
          expr("transform(pm, x -> x.m)").as("new_emb"))
      fine = graft.Ckpt(fine.join(means, Seq("cell", "fine_id"), "left")
        .select(col("cell"), col("fine_id"),
          coalesce(col("new_emb"), col("fine_emb")).as("fine_emb")))
    }
    fine
  }
}
