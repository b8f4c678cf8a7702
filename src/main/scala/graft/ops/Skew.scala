package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers (SURVEY.md §7.4 scale posture).
  *
  * AQE's OptimizeSkewedJoin (left on) handles most runtime skew by splitting
  * oversized partitions; explicit salting remains the tool when one join key
  * dominates so heavily that even a split partition is one key's rows. The
  * salted join spreads a hot key over `s` tasks by deriving a salt from a
  * NON-key fact column and replicating the (small) dim side `s` ways —
  * result-identical to the plain join.
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
