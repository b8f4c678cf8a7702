package graft

import org.apache.spark.sql.DataFrame

/** [[Ckpt]] strategy selection: every iterative query must produce
  * byte-identical results whether lineage truncation goes through
  * localCheckpoint (no checkpoint dir — the local[*] default) or a
  * reliable checkpoint dir (the cluster configuration). The dir is set
  * only inside this suite and cleared in a finally, so the rest of the
  * test run keeps the default local path.
  */
class CkptSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def withCheckpointDir[A](body: => A): A = {
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty, "expected no checkpoint dir at entry")
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    sc.setCheckpointDir(dir)
    try body
    finally sc.setCheckpointDir(null) // Option(null) => None, clears it
  }

  test("Ckpt picks reliable checkpoint when a dir is configured") {
    import spark.implicits._
    val local = Ckpt(Seq(1, 2, 3).toDF("v"))
    assert(local.queryExecution.analyzed.toString.contains("LogicalRDD"))
    withCheckpointDir {
      assert(spark.sparkContext.getCheckpointDir.isDefined)
      val reliable = Ckpt(Seq(1, 2, 3).toDF("v"))
      assert(rows(reliable.orderBy("v")) === rows(local.orderBy("v")))
    }
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
  }

  test("iterative queries are identical under a reliable checkpoint dir") {
    // The queries whose declared plans route through Ckpt: x20 (CC
    // rounds), x25 (x20 + keep list), x27 (sampled range cells),
    // x21_semdedup_learned (Lloyd trainer), r7 (edge frame); round-8
    // continuation: r9 (edge + orientation frames), r11 (BFS rounds),
    // w8 (sampled range cells); continuation 2: a22 (shared level frame),
    // x41 (x27's cells via composition), l7/l9 (shared Ckpt'd TF frame),
    // w10 (shared revenue frame).
    // round 9: r12 (edge frame + per-round dist/frontier), x42 (shared
    // posting frame), x43 (shared (source, word) count frame),
    // r13 (edge frame + per-round (n, src) frontier/visited)
    val qs = Seq("x20_dup_clusters", "x27_shard_pack",
      "x21_semdedup_learned", "r7_pagerank",
      "r9_triangles", "r11_bfs", "w8_ntile_spend",
      "a22_mad", "x41_shard_audit", "l7_tfidf", "l9_keyword_topk",
      "w10_pareto_share",
      "r12_sssp_bounded", "x42_ngram_novelty", "x43_kl_drift",
      "x44_minhash_accuracy", "x45_dsir_weights", "s15_streaks",
      "x47_cluster_sep", "r13_harmonic",
      // round 10: r14 (per-round peeled edge frames), r15 (edge +
      // degree + oriented frames through r9's machinery), x54 (shared
      // quantized-quality frame feeding buckets + moments)
      "r14_kcore", "r15_jaccard_links", "x54_length_bias",
      "r16_assortativity",
      // round 11: x57 (Ckpt'd signature index feeding the banding and
      // both verify probes), r17 (triangleFrames' Ckpt'd degree +
      // oriented frames)
      "x57_incr_neardup", "r17_clustering",
      // round 13: x70/x72 (bpeChain's Ckpt'd tf + per-round 1-row top
      // pairs — the corpus explode must run ONCE, every merge round
      // re-reads the truncated frame), r20 (triangleFrames' edge +
      // degree + oriented frames through the shared enumeration)
      "x70_bpe_train", "x72_bpe_compression", "r20_local_bridges")
    val before = qs.map(q => q -> rows(SparkEntry.queries(q)(spark, sf001))).toMap
    withCheckpointDir {
      qs.foreach { q =>
        assert(rows(SparkEntry.queries(q)(spark, sf001)) === before(q),
          s"$q diverged under reliable checkpoint")
      }
    }
  }

  test("DedupCluster fixpoint loop runs under a reliable checkpoint dir") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val expect = Seq("[1,1]", "[2,1]", "[3,1]", "[10,10]", "[11,10]")
    assert(rows(ops.DedupCluster.components(pairs)) === expect)
    withCheckpointDir {
      assert(rows(ops.DedupCluster.components(pairs)) === expect)
    }
  }
}
