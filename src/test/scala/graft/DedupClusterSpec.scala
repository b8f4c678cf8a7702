package graft

import org.apache.spark.sql.functions._
import graft.ops.DedupCluster

/** Connected-component clustering over near-dup pairs. */
class DedupClusterSpec extends SparkSpec {
  import spark.implicits._

  test("components on a known graph") {
    // {1-2, 2-3} + {10-11} + isolated via pairs only
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val comp = DedupCluster.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("chain graph needs multiple propagation rounds") {
    val chain = (1L until 20L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val comp = DedupCluster.components(chain).collect()
    assert(comp.forall(_.getLong(1) == 1L))
    assert(comp.length === 20)
  }

  test("pointer doubling: a 100-node chain converges in ≤7 rounds (log, not diameter)") {
    // hook-only propagation moves the min one hop per round — 99 rounds
    // for this graph, so maxIters = 7 would throw; the shortcut's
    // coverage recurrence (2, 6, 14, 30, 62, 126 hops) converges by
    // round 6 and round 7 observes zero changes.
    val chain = (1L until 100L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val comp = DedupCluster.components(chain, maxIters = 7).collect()
    assert(comp.length === 100)
    assert(comp.forall(_.getLong(1) == 1L))
  }

  test("fixture near-dup pairs cluster consistently (l2 at sf0.001)") {
    val pairs = ops.Llm.l2(spark, sf001).select("a_id", "b_id")
    val comp = DedupCluster.components(pairs)
    // every paired doc got a label; cluster id is a member of the cluster
    val byCluster = comp.groupBy("cluster_id").agg(min("doc_id").as("m"))
    assert(byCluster.filter($"cluster_id" =!= $"m").count() === 0)
    // both endpoints of every pair share a cluster
    val ca = comp.select($"doc_id".as("a_id"), $"cluster_id".as("c_a"))
    val cb = comp.select($"doc_id".as("b_id"), $"cluster_id".as("c_b"))
    val broken = pairs.join(ca, "a_id").join(cb, "b_id")
      .filter($"c_a" =!= $"c_b").count()
    assert(broken === 0)
  }

  test("survivors = all docs minus non-canonical members") {
    val pairs = ops.Llm.l2(spark, sf001).select("a_id", "b_id")
    val surv = DedupCluster.survivors(spark, sf001, pairs)
    val total = Tables.documents(spark, sf001).count()
    val comp = DedupCluster.components(pairs)
    val nonCanonical = comp.filter($"doc_id" =!= $"cluster_id").count()
    assert(surv.count() === total - nonCanonical)
  }

  test("end-to-end dedup pipeline: LSH pairs -> components -> survivors") {
    val surv = ops.Pipeline.dedupPipeline(spark, sf001)
      .as[Long].collect().toSet
    val total = Tables.documents(spark, sf001).count()
    assert(surv.nonEmpty && surv.size < total,
      "the fixture contains near-dups, so some docs must be deduplicated")
    // every removed doc has a surviving representative it was paired with,
    // transitively: its cluster id survives
    val comp = DedupCluster.components(
      ops.Pipeline.x1(spark, sf001).select("a_id", "b_id"))
    comp.collect().foreach { r =>
      val (doc, cluster) = (r.getLong(0), r.getLong(1))
      if (!surv.contains(doc)) assert(surv.contains(cluster),
        s"removed doc $doc must be represented by surviving cluster head $cluster")
    }
  }

  test("trainingSet manifest: dedup-free, quality-bounded, split-complete") {
    val m = ops.Pipeline.trainingSet(spark, sf001, minQuality = 0.5)
    val rows = m.collect()
    assert(rows.nonEmpty)
    // unique doc ids, quality gate respected, split values well-formed
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    assert(rows.forall(_.getAs[Double]("quality") >= 0.5))
    assert(rows.map(_.getAs[String]("split")).toSet.subsetOf(Set("train", "val", "test")))
    // no surviving near-dup pair: every x1 pair lost at least one side
    // unless the pair straddles the quality gate
    val kept = rows.map(_.getLong(0)).toSet
    val pairs = ops.Pipeline.x1(spark, sf001).select("a_id", "b_id").collect()
    pairs.foreach { p =>
      assert(!(kept.contains(p.getLong(0)) && kept.contains(p.getLong(1))),
        s"near-dup pair (${p.getLong(0)}, ${p.getLong(1)}) both survived")
    }
    // deterministic across runs
    val again = ops.Pipeline.trainingSet(spark, sf001, minQuality = 0.5).collect()
    assert(rows.toSeq == again.toSeq)
  }
}
