package graft

import org.apache.spark.sql.functions._
import graft.ops.Observe

/** Observation-API audits: metrics computed during the action equal a
  * separate exact aggregation — and they observe the POST-filter stream.
  */
class ObserveSpec extends SparkSpec {

  test("observed ingest metrics equal a separate exact aggregation") {
    val gated = Tables.documents(spark, sf001)
      .withColumn("wc", size(split(col("text"), " ")))
      .filter(col("wc") >= 5)
    val (audited, obs) = Observe.audited(gated, "ingest_audit", Seq(
      "docs" -> count(lit(1)),
      "tokens" -> sum(col("wc").cast("bigint")),
      "null_texts" -> count(when(col("text").isNull, 1))))
    BenchAction.exec(audited) // the real pipeline action drives the metrics
    val row = obs.get
    val exact = gated.agg(count(lit(1)), sum(col("wc").cast("bigint")))
      .head()
    assert(row("docs") === exact.getLong(0))
    assert(row("tokens") === exact.getLong(1))
    assert(row("null_texts") === 0L)
    // the metrics audited the filtered stream, not the raw scan
    assert(row("docs").asInstanceOf[Long] <
      Tables.documents(spark, sf001).count()
      || gated.count() === Tables.documents(spark, sf001).count())
  }
}
