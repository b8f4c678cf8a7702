package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic-sketch capabilities (SURVEY §2.8 "intentionally not
  * oracle-declared" tier — approximate by construction, so they are
  * bound-tested in `SketchSpec` instead of hash-compared):
  *
  *  - [[bloomPreFilter]]: the manual form of the runtime-filter / semi-join
  *    pushdown every warehouse does at scale — build a Bloom filter over
  *    the dim-side join keys (one pass, fixed bits), broadcast it, and
  *    drop non-matching fact rows BEFORE the shuffle. At 100 TB the win is
  *    shuffle VOLUME: a selective dim prunes most of the fact at the scan,
  *    and the exact join downstream removes the false positives, so the
  *    result is identical to the plain join (asserted). Spark's own
  *    `spark.sql.optimizer.runtime.bloomFilter.enabled` injects the same
  *    shape automatically when stats justify it; the explicit helper
  *    covers the cases the optimizer can't see (pre-aggregated dims,
  *    cross-query reuse of one built filter).
  *  - [[heavyHitters]]: Count-Min-Sketch heavy hitters — frequency
  *    estimates for hot keys in ONE pass with fixed memory (eps/confidence
  *    sized), the skew-DETECTION companion to [[Skew.saltedJoin]]'s
  *    mitigation: overestimates only, never misses a hot key.
  *
  * Both build on `DataFrame.stat` (driver-side sketch objects of FIXED
  * size — KB–MB regardless of corpus; the aggregation itself is
  * distributed with mergeable partials). The Bloom membership test rides a
  * scala UDF: Spark's `might_contain` Catalyst expression is internal-only
  * (BloomFilterAggregate is not in the public function registry), and the
  * UDF sits in a FILTER on the pre-shuffle map side — off the
  * whole-stage-codegen hot path concern PlanLintSpec polices for declared
  * queries (capability tier; the filter's per-row cost is two hashes).
  */
object Sketches {

  /** Exact join result, Bloom-pruned fact side: `fact ⋈ dim` on
    * `factKey = dimKey` where fact rows failing the dim-key Bloom test are
    * dropped before the join shuffle. `expectedDim` sizes the filter
    * (number of distinct dim keys), `fpp` the false-positive rate.
    */
  def bloomPreFilter(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedDim: Long, fpp: Double): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedDim, fpp)
    val mightContain = udf((k: Long) => bf.mightContainLong(k))
    fact.filter(mightContain(col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }

  /** Keys whose Count-Min estimate exceeds `minCount`, with the estimate.
    * CMS guarantees est ≥ true and est ≤ true + eps·N with the given
    * confidence, so every true heavy hitter survives; the caller
    * exact-counts the (few) survivors when exactness matters.
    */
  def heavyHitters(df: DataFrame, key: String, candidates: Seq[Long],
      eps: Double, confidence: Double, minCount: Long): Seq[(Long, Long)] = {
    val cms = df.stat.countMinSketch(key, eps, confidence, seed = 42)
    candidates.map(k => k -> cms.estimateCount(k)).filter(_._2 >= minCount)
  }
}
