package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers (SURVEY.md §7.4 scale posture).
  *
  * DESIGN DECISION (r9 verdict item 5, resolved round 10 by measurement —
  * `graft.tools.ProbeSkew`, the recorded A/B): automatic salting is NOT an
  * optimizer rule in this engine; AQE's OptimizeSkewedJoin is the default
  * mitigation and salting stays this explicit library call. On the probed
  * one-dominant-key shape (lineitem×16 ≈ 9.6M fact rows with ~30% of them
  * on ONE suppkey, broadcast disabled so the shuffle join faces the skew,
  * thresholds at the production RATIO):
  *
  *   smj, skew-join off   1.38 s   (hot task drags the stage)
  *   smj, skew-join ON    0.66 s   (AQE splits the hot partition by
  *                                  mapper ranges, dup'ing the build side)
  *   saltedJoin s = 8     0.98 s   (helps, but pays dim ×8 replication
  *                                  and a wider shuffle key up front)
  *
  * AQE both FIRES on the single-dominant-key case (`skew=true` in the
  * final plan — SkewSpec pins this) and BEATS static salting, because it
  * splits only what runtime sizes prove hot while salting taxes every row
  * of both sides. A rule that salts statically would re-implement the
  * weaker of the two. [[saltedJoin]] remains for the cases AQE cannot
  * see: sessions running static plans (AQE off), and joins whose output
  * partitioning must survive for a same-key downstream consumer (AQE
  * refuses to split a shuffle that a later stage reuses).
  *
  * The salted join spreads a hot key over `s` tasks by deriving a salt
  * from a NON-key fact column and replicating the (small) dim side `s`
  * ways — result-identical to the plain join.
  */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltSrc: Column, s: Int): DataFrame = {
    // hash() maps NULL to its seed (non-null), so NULL saltSrc rows still get
    // a valid salt instead of silently dropping out of the equi-join; the
    // coalesce keeps that guarantee explicit rather than implementation-luck.
    val saltedFact = fact.withColumn("__salt",
      pmod(coalesce(hash(saltSrc), lit(0)), lit(s)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(s - 1))))
    saltedFact
      .join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey)
          && saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }
}
