package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (schemas: FIXTURES.md).
  *
  * Reference analog: the triple-store input scans of the
  * `ahaque/rdf-mapreduce-joins` mappers [RECON — the reference tree was empty
  * at build time, see SURVEY.md §0]. Each loader is a plain parquet scan so
  * Catalyst can push filters/projections all the way into the columnar reader
  * (verified via `.explain`: `PushedFilters`/`ReadSchema`).
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** `events.parquet` carries nanosecond-precision timestamps, which Spark
    * 4.x refuses to read unless `spark.sql.legacy.parquet.nanosAsLong=true`
    * (error `PARQUET_TYPE_ILLEGAL`). With the conf, `ts` reads as `LongType`
    * epoch-nanoseconds; all event-time math is integer math on those longs
    * and the DuckDB oracle mirrors it via `epoch_ns(ts)` (SURVEY.md §2.0 D3).
    * The conf is runtime-settable and must precede the read.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events")
  }
}
