package graft

import org.apache.spark.sql.functions._
import graft.ops.KMeansCodebook

/** Lloyd codebook trainer: objective monotonicity + determinism (no RNG
  * anywhere, so two trainings must agree bit-for-bit).
  */
class KMeansSpec extends SparkSpec {

  private def vecs = Tables.embeddings(spark, sf001)
    .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("emb"))

  test("SSE is non-increasing across Lloyd iterations") {
    val v = vecs
    val sses = (0 to 3).map(i => KMeansCodebook.sse(v, KMeansCodebook.train(v, 4, i)))
    sses.zip(sses.tail).foreach { case (a, b) =>
      assert(b <= a + 1e-9, s"SSE increased: $sses")
    }
    // and training moved the objective at least once on this fixture
    assert(sses.last < sses.head)
  }

  test("training is deterministic and centroids keep the embedding dims") {
    val a = KMeansCodebook.train(vecs, 4, 2).orderBy("cent_id").collect()
    val b = KMeansCodebook.train(vecs, 4, 2).orderBy("cent_id").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length === 4)
    a.foreach(r => assert(r.getSeq[Double](1).length === 64))
  }

  test("empty cells retain their previous centroid (k never shrinks)") {
    // All-identical vectors: every vector ties to the min cent_id, so cells
    // 2..4 receive nothing — they must survive the update with their
    // round-0 centroids instead of silently dropping out.
    val same = vecs.limit(8).select(col("id"), expr("transform(emb, x -> 0.5d)").as("emb"))
    val cb = KMeansCodebook.train(same, 4, 2).orderBy("cent_id").collect()
    assert(cb.length === 4)
    cb.foreach(r => assert(r.getSeq[Double](1).length === 64))
  }

  test("every vector lands in exactly one cell of the trained codebook") {
    val v = vecs
    val cb = KMeansCodebook.train(v, 4, 2)
    val asgn = KMeansCodebook.assign(v, cb)
    assert(asgn.count() === v.count())
    assert(asgn.select("id").distinct().count() === v.count())
    assert(asgn.select("cell").distinct().count() <= 4)
  }
}
