package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.DotProduct.dot

/** LLM-data-pipeline operators (SURVEY.md §2.8, north-star extension):
  * dedup, near-dup, similarity search, text analysis over the documents and
  * embeddings fixtures.
  *
  * Scale posture: l1 is a hash groupBy (shuffles once on the hash — the scale
  * path); l2's pairwise compare is bucketed by lang here and by MinHash/LSH
  * band at 100 TB (see graft.ops.Pipeline for the banded variant); l3
  * broadcasts the query vectors so candidates never shuffle.
  */
object Llm {

  /** l1 — exact dedup on normalized text via md5 grouping: survivor id (min
    * doc_id) + duplicate count per content hash.
    */
  def l1(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("text_hash", md5(lower(trim(col("text"))).cast("binary")))
      .groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("survivor_id"), count(lit(1)).as("dup_cnt"))
      .select(col("survivor_id"), col("text_hash"), col("dup_cnt"))
      .orderBy("survivor_id")

  /** l2 — near-duplicate pairs within language buckets: token-set Jaccard
    * >= 0.9, decided in exact integer math (10*|∩| >= 9*|∪|); the reported
    * jaccard is the rounded double (D4).
    *
    * Scale: a plain self-join on `lang` has only 5 distinct keys → 5 tasks do
    * all the pairwise work. The join is block-decomposed instead (one side
    * tagged id%B, the other replicated over all B blocks) so the shuffle key
    * is (lang, block) → lang×B parallel tasks, identical output, and the
    * per-pair verify is a 3-ALU-op bitmask intersect. On an OPEN-vocabulary
    * corpus swap candidate generation to SetSim.prefixCandidates (PPJoin
    * prefix + positional filtering, exact recall at t=9/10, property-
    * tested); on this fixture's closed 31-token vocabulary every posting
    * list is dense, and the prefix join measures 7× SLOWER than the bitmask
    * all-pairs (8.6 s vs 1.1 s at sf0.1) — token selectivity, not pair
    * enumeration, is what an LSH/prefix scheme needs to win.
    *
    * Measured 1×–8× (round 10, BASELINE.md): 1.46 → 38.1 s, 26× — the one
    * super-linear curve on the board, and it is the DECLARED semantics,
    * not a plan defect: exact threshold-Jaccard over a locally-dense
    * corpus (every synthetic copy keeps a closed vocabulary) admits no
    * exact pruning below pairwise enumeration, and lang buckets grow ×8 ⇒
    * ×64 pairs. At 100 TB this operator is the exact PAIRWISE PRIMITIVE
    * run downstream of candidate generation (x1's LSH / x3's PPJoin —
    * both measured sublinear on the same corpora), never the corpus-wide
    * driver — and since round 11 that positioning is ENFORCED, not just
    * documented: [[SetSim.pairs]] fails loudly when any bucket exceeds
    * [[SetSim.DefaultMaxBucket]], naming the sublinear operators (the
    * guard costs one lang-keyed count + broadcast identity join,
    * ~0.2 s on the sf0.1 floor; fixture output unchanged).
    */
  def l2(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        array_distinct(split(col("text"), " ")).as("toks"))
    // enc feeds the bucket-size guard AND both block-join sides — Ckpt so
    // the encode pass (explode + vocab probe + per-doc collect agg) runs
    // once, not three times (round-14, guide §2.4)
    val enc = graft.Ckpt.shared(SetSim.tokenSets(toks))
    SetSim.pairs(enc, blocks = 16)
      .filter(col("inter") * 10 >= col("uni") * 9)
      .select(col("lang"), col("a_id"), col("b_id"),
        graft.Det.round4fast(col("inter").cast("double") / col("uni")).as("jaccard"))
      .orderBy("lang", "a_id", "b_id")
  }

  /** l3 — brute-force cosine top-5 for the 10 query vectors (vec_id < 10).
    * Query side is broadcast; all double math with 4-dp rounding, ranked by
    * (rounded sim desc, id) so both engines rank identically (D4).
    */
  def l3(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .withColumn("emb", col("embedding").cast("array<double>"))
      .withColumn("norm", sqrt(dot(col("emb"), col("emb"))))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"), col("norm").as("q_norm"))
    val c = e.select(col("vec_id").as("c_id"), col("emb").as("c_emb"),
      col("norm").as("c_norm"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id"))
    broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .withColumn("sim",
        graft.Det.round4nz(dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm"))))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("c_id"), col("sim"))
      .orderBy("q_id", "rnk")
  }

  /** l4 — tokenize + global top-20 token frequencies (UDTF-shaped explode). */
  def l4(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)

  /** l6 — BM25 keyword retrieval: top-10 documents for the fixed query
    * {dup, vector, spark} (one rare + two mid-frequency terms of the corpus
    * vocabulary), k1 = 1.2, b = 0.75.
    *
    * Scale shape: per-doc term frequencies and doc length are NARROW column
    * ops (no explode/shuffle); the corpus statistics (N, Σdl, per-term df)
    * are ONE global aggregate broadcast back as a single row; the final
    * top-10 is `orderBy().limit()` → TakeOrderedAndProject, a distributed
    * bounded top-k with no single-partition window. All inputs to the score
    * are exact integers; the double formula is evaluated in one fixed
    * expression order (term order dup→vector→spark) mirrored by the oracle.
    */
  def l6(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("dup", "vector", "spark")
    val docs = terms.foldLeft(
        Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .withColumn("dl", size(col("w")))) { (df, t) =>
        df.withColumn(s"tf_$t", size(filter(col("w"), x => x === t)))
      }.drop("w")
    val statCols = Seq(sum(col("dl")).as("sum_dl")) ++ terms.map(t =>
      sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = docs.agg(count(lit(1)).as("n_docs"), statCols: _*)
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    def idf(t: String) =
      log((col("n_docs") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5)) + lit(1.0))
    def termScore(t: String) =
      idf(t) * (col(s"tf_$t") * lit(2.2)) /
        (col(s"tf_$t") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl"))))
    docs.crossJoin(broadcast(stats))
      .withColumn("avgdl", avgdl)
      .withColumn("score",
        graft.Det.round4nz(terms.map(termScore).reduce(_ + _)))
      .select(Seq(col("doc_id"), col("dl")) ++ terms.map(t => col(s"tf_$t"))
        :+ col("score"): _*)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  /** l5 — per-language text statistics: doc count, word/distinct-word sums,
    * type-token ratio and chars-per-word as exact-integer ratios (D4).
    */
  def l5(s: SparkSession, d: String): DataFrame = {
    val per = Tables.documents(s, d)
      .select(col("lang"),
        size(split(col("text"), " ")).as("wc"),
        size(array_distinct(split(col("text"), " "))).as("dc"),
        col("n_chars"))
    per.groupBy("lang")
      .agg(count(lit(1)).as("doc_cnt"),
        sum(col("wc")).as("sum_wc"),
        sum(col("dc")).as("sum_dc"),
        sum(col("n_chars")).as("sum_chars"),
        round(sum(col("dc")).cast("double") / sum(col("wc")).cast("double"), 4)
          .as("ttr"),
        round(sum(col("n_chars")).cast("double") / sum(col("wc")).cast("double"), 4)
          .as("chars_per_word"))
      .orderBy("lang")
  }

  /** l7 — TF-IDF: corpus-wide top-100 (doc, term) pairs by tf·idf. The idf
    * ln is the one transcendental: it is rounded to 9 dp and quantized to
    * DECIMAL(18,9) BEFORE the tf multiply (x13's D2 pattern for
    * transcendental per-row values), so tf·idf is exact integer×decimal on
    * both engines and the ranking can't flake in low bits. Ties broken by
    * (doc_id, term) for a total order (D1/D6 — LIMIT only after it).
    *
    * Scale: two keyed aggregations (term frequencies per (doc, term), then
    * document frequencies per term), a keyed equi-join back on term, one
    * broadcast scalar (corpus size), and a global top-k that plans as
    * TakeOrderedAndProject (bounded heap per partition — no global sort).
    */
  def l7(s: SparkSession, d: String): DataFrame =
    tfidfScores(s, d)
      .select(col("doc_id"), col("term"), col("tf"), col("score"))
      .orderBy(col("score").desc, col("doc_id"), col("term"))
      .limit(100)

  /** Shared TF-IDF scoring frame for l7/l9 (one definition, the queries
    * cannot drift). The (doc, term, tf) frame feeds BOTH its own join side
    * and the document-frequency aggregate — without lineage truncation the
    * planner derives it twice (explode + shuffle ×2; runtime ReusedExchange
    * measured absent on this shape), so it is materialized ONCE through
    * Ckpt (corpus-linear, 3 narrow columns). The corpus-size scan stays a
    * separate count-star (column-pruned metadata read — deriving n from
    * the tf frame would silently miscount empty documents).
    */
  private[graft] def tfidfScores(s: SparkSession, d: String): DataFrame = {
    val tf = graft.Ckpt.shared(Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = Tables.documents(s, d).agg(count(lit(1)).as("n"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("idf",
        round(log(col("n").cast("double") / col("df").cast("double")), 9)
          .cast("decimal(18,9)"))
      // tf as DECIMAL(10,0), not long: a long multiplicand widens the product
      // past precision 38 and Spark trims its scale to 8, silently rounding
      // the 9th idf digit (observed: 8.98719682 vs exact 8.987196822).
      .select(col("doc_id"), col("term"), col("tf"),
        (col("tf").cast("decimal(10,0)") * col("idf")).cast("double").as("score"))
  }

  /** l8 — PMI collocation mining (the classic corpus-statistics pass that
    * finds multi-word expressions worth protecting from tokenizer splits):
    * top-50 adjacent word pairs by pointwise mutual information,
    * pmi = ln(N·c12 / (c1·c2)), over pairs seen ≥ 5 times. c1/c2 are the
    * POSITIONAL marginals (w1 as first element, w2 as second — exactly the
    * bigram model's conditioning counts).
    *
    * Determinism: all four counts are exact longs and both cross-products
    * stay far under 2^53, so they cast to double exactly and the quotient
    * is CORRECTLY ROUNDED by IEEE 754 — bit-identical on any engine. The
    * ranking therefore orders by that exact ratio (ln is monotone, so
    * ratio order == pmi order) with (w1, w2) tie-break (D4) and LIMIT only
    * after the total order (D6). `ln` itself carries no correct-rounding
    * guarantee (Spark uses java.lang.Math.log's 1-ulp contract, other
    *  engines use libm), so it is kept OUT of the sort key and used only
    * for the displayed 4-dp pmi, where a 1-ulp divergence would have to
    * land exactly on a rounding boundary to show.
    *
    * Scale: bigram explode is narrow (codegen NGrams); three keyed aggs;
    * the c1/c2 joins are keyed on vocabulary-sized frames (no broadcast
    * hint — vocabulary is unbounded at 100 TB, AQE broadcasts if small);
    * N is ONE broadcast scalar row; top-50 plans as TakeOrderedAndProject.
    */
  def l8(s: SparkSession, d: String): DataFrame = {
    val bi = Tables.documents(s, d)
      .select(explode(graft.functions.NGrams.ngrams(split(col("text"), " "), 2)).as("bg"))
      .select(substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
    val n = bi.agg(count(lit(1)).as("n_total"))
    val c12 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val c2 = bi.groupBy(col("w2")).agg(count(lit(1)).as("c2"))
    val ratio = (col("c12") * col("n_total")).cast("double") /
      (col("c1") * col("c2")).cast("double")
    c12.filter(col("c12") >= 5)
      .join(c1, Seq("w1"))
      .join(c2, Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c12"),
        graft.Det.round4nz(log(ratio)).as("pmi"),
        ratio.as("ratio"))
      .orderBy(col("ratio").desc, col("w1"), col("w2"))
      .limit(50)
      .select(col("w1"), col("w2"), col("c12"), col("pmi"))
  }

  /** l9 — per-document keyword extraction: each doc's top-3 terms by TF-IDF
    * (l7's exact scoring — same 9-dp decimal idf, same decimal tf×idf
    * product — so the two queries cannot drift), ranked per doc with
    * (score desc, term asc) tie-break (D6).
    *
    * Scale: l7's three keyed aggs + a doc-keyed row_number whose partitions
    * are each doc's DISTINCT-term count (document-length-bounded, not
    * corpus-bounded). The df join is vocabulary-keyed with no broadcast
    * hint — AQE broadcasts when small, shuffles when the open vocabulary
    * isn't (l8's discipline).
    */
  def l9(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    tfidfScores(s, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("term"), col("score"))
      .orderBy("doc_id", "rk")
  }

  /** l10 — LANGUAGE-ID CONFUSION MATRIX: x5's n-gram classifier evaluated
    * against the fixture's labeled `lang` column as a (actual, predicted)
    * matrix with per-cell count and row-share — the calibration card that
    * decides whether a lang-ID gate's threshold is trustworthy before it
    * drops terabytes (the eval face of x5, exactly as x44 audits x1 and
    * x47 audits x21). One keyed agg over x5's narrow per-doc frame; the
    * share window runs on the aggregated cells (≤ |langs|² = 25 rows,
    * domain-bounded).
    */
  def l10(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("actual_lang")
    Pipeline.x5(s, d)
      .groupBy(col("actual_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("row_share", graft.Det.round4nz(col("n_docs").cast("double")
        / sum(col("n_docs")).over(w).cast("double")))
      .orderBy("actual_lang", "pred_lang")
  }
}
