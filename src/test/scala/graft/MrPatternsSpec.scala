package graft

import graft.ops.MrPatterns

/** RDD MapReduce idioms ≡ their DataFrame replacements. */
class MrPatternsSpec extends SparkSpec {

  test("reduce-side and map-side RDD joins equal the DataFrame join") {
    val o = Tables.orders(spark, sf001)
    val c = Tables.customer(spark, sf001)
    val dfCount = o.join(c, o("o_custkey") === c("c_custkey")).count()
    val reduceSide = MrPatterns.reduceSideJoin(spark, sf001).collect().toSet
    val mapSide = MrPatterns.mapSideJoin(spark, sf001).collect().toSet
    assert(reduceSide.size.toLong === dfCount)
    assert(reduceSide === mapSide)
  }

  test("combiner aggregation equals DataFrame groupBy aggregation") {
    val rdd = MrPatterns.combinerAgg(spark, sf001).collect()
      .map { case (k, (s, n)) => (k, s, n) }.sortBy(_._1).toSeq
    val df = MrPatterns.combinerAggDf(spark, sf001).collect()
      .map(r => (r.getString(0), BigDecimal(r.getDecimal(1)), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(rdd === df)
  }

  test("secondary sort delivers each customer's orders date-ordered") {
    val parts = MrPatterns.secondarySort(spark, sf001)
      .mapPartitions(it => Iterator.single(it.map(_._1).toSeq))
      .collect()
    parts.foreach { keys =>
      keys.sliding(2).foreach {
        case Seq((c1, t1), (c2, t2)) if c1 == c2 => assert(t1 <= t2)
        case _ =>
      }
    }
    assert(parts.map(_.size).sum === Tables.orders(spark, sf001).count())
  }
}
