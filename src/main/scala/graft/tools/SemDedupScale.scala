package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.DotProduct.{dot => vdot}
import graft.ops.{KMeansCodebook, Pipeline}

/** The k-PROPORTIONAL-TO-CORPUS SemDedup scale measurement — the curve the
  * declared x21's docstring caveat points at. The declared x21 variants pin
  * k = 16 so the DuckDB oracle can mirror them; with k fixed, cell
  * population grows ∝ m on an m× corpus and the within-cell pair join is
  * quadratic (measured 5.5× time / 63× candidates at 8× in ScaleProfile's
  * fixed-k table). The documented scale path keeps k/corpus constant
  * (k = 16·m here) so per-cell population — and per-VECTOR candidate
  * work — stays flat and total work grows linearly. This harness measures
  * that path on ScaleProfile's m-copy corpora:
  *
  *  - `identity` variant: per-copy identity codebook (`vec_id % n₀ < 16` —
  *    each copy contributes the rotations of copy 0's 16 identity
  *    centroids, so the codebook grows with the corpus exactly as x21's
  *    "first 16 vectors" rule would on a natural corpus); timed section =
  *    x21With (assign + blocked within-cell pair join), x21's exact dedup
  *    semantics at scaled k;
  *  - `learned` variant: `KMeansCodebook.trainMirrored(k = 16·m, 2 iters)`
  *    then x21With — the x21_semdedup_learned path at production k; timed
  *    section includes training (its broadcast-assign term is N·k FLOPs —
  *    the flat-codebook cost the [[graft.ops.KMeansCodebook
  *    .trainHierarchical]] two-level path removes past the broadcast
  *    limit).
  *
  * Reported per (variant, m): min-of-3 interleaved seconds, within-cell
  * CANDIDATE pairs Σ n·(n−1)/2 (the work the cell locality is supposed to
  * bound), candidates per vector (the flatness claim), and emitted pairs.
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.SemDedupScale'`
  * (optionally `<srcSfDir> <outBase>`); results land in BASELINE.md's
  * round-8 SemDedup table.
  */
object SemDedupScale {

  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val base = if (args.length > 1) args(1) else "/tmp/graft-scale"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleProfile.Mults.foreach(m =>
      ScaleProfile.build(spark, src, s"$base/m$m", m))
    val n0 = spark.read.parquet(s"$src/embeddings.parquet")
      .agg(max("vec_id")).head().getLong(0) + 1

    def emb(m: Int): DataFrame =
      spark.read.parquet(s"$base/m$m/embeddings.parquet")
        .withColumn("emb", col("embedding").cast("array<double>"))
        .withColumn("nrm", sqrt(vdot(col("emb"), col("emb"))))
        .select(col("vec_id"), col("emb"), col("nrm"))

    def identityCb(e: DataFrame, m: Int): DataFrame =
      e.filter(col("vec_id") % n0 < 16)
        .select(col("vec_id").as("cent_id"), col("emb").as("cent_emb"),
          col("nrm").as("cent_nrm"))

    def learnedCb(e: DataFrame, m: Int): DataFrame =
      KMeansCodebook.trainMirrored(
          e.select(col("vec_id").as("id"), col("emb")), 16 * m, 2)
        .select(col("cent_id"), col("cent_emb"),
          sqrt(vdot(col("cent_emb"), col("cent_emb"))).as("cent_nrm"))

    val variants: Seq[(String, Int => DataFrame)] = Seq(
      "identity" -> { m: Int =>
        val e = emb(m); Pipeline.x21With(e, identityCb(e, m)) },
      "learned" -> { m: Int =>
        val e = emb(m); Pipeline.x21With(e, learnedCb(e, m)) })

    val best = scala.collection.mutable.Map[(String, Int), Double]()
    (1 to 3).foreach { _ =>
      ScaleProfile.Mults.foreach { m =>
        variants.foreach { case (name, f) =>
          val t0 = System.nanoTime()
          graft.BenchAction.exec(f(m))
          best((name, m)) = math.min(
            best.getOrElse((name, m), Double.MaxValue),
            (System.nanoTime() - t0) / 1e9)
        }
      }
    }

    // untimed stats passes: candidate volume from the identity-codebook
    // cell populations (the learned ones differ only in balance), plus
    // emitted pairs per variant
    println("| variant | m | k | time s | cand pairs | cand/vec | out pairs |")
    println("|---|---|---|---|---|---|---|")
    variants.foreach { case (name, f) =>
      ScaleProfile.Mults.foreach { m =>
        val e = emb(m)
        val cb = if (name == "identity") identityCb(e, m) else learnedCb(e, m)
        val cand = Pipeline.x21Assign(e, cb)
          .groupBy("cell").agg(count(lit(1)).as("n"))
          .agg(sum(expr("n * (n - 1) DIV 2"))).head().getLong(0)
        val nVec = n0 * m
        val out = f(m).count()
        println(f"| $name | $m | ${16 * m} | ${best((name, m))}%.2f " +
          f"| $cand%d | ${cand.toDouble / nVec}%.1f | $out%d |")
      }
    }
    spark.stop()
  }
}
