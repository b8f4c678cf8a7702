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
  /** Resolved-DataFrame memo per (session, dir, table).
    * `spark.read.parquet(path)` runs synchronous schema INFERENCE — a
    * footer read — on every call, and this repo constructs each table's
    * DataFrame fresh inside every declared query (235 queries × 3 bench
    * passes, iterative operators, multi-table joins). ProbeOverhead
    * measured 0.10-0.46 s of the sub-second tail's per-query time in plan
    * CONSTRUCTION, dominated by exactly these footer reads (j3's five
    * tables: 0.43 s). Returning the SAME immutable DataFrame per
    * (session, dir, table) elides the repeat inference and relation
    * resolution; the DATA is still read from parquet by every job — this
    * memoizes a logical plan, never results. (A `.schema(inferred)`
    * variant was tried first and REVERTED: the user-specified-schema read
    * path drops parquet filter pushdown on the nested-column embeddings
    * table — PlanLintSpec's pushdown lint caught PushedFilters: [] on
    * x9/x11/l3 — while plan-identity memoization keeps the inferred-
    * schema path byte-identical.) Keyed weakly by session so test
    * sessions don't leak; a dir's fixture files are immutable within a
    * process lifetime (the driver regenerating fixtures restarts the
    * JVM).
    */
  private val frameCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]()

  private def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = frameCache.synchronized {
      var m = frameCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
        frameCache.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent((dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** `events.ts` is normalized to `LongType` epoch-NANOSECONDS regardless of
    * how the fixture generation stored it, so every downstream event-time
    * operator does exact integer math on one canonical unit:
    *
    *  - nanosecond fixtures (rounds 1-6): parquet `TIMESTAMP(NANOS)`, which
    *    Spark 4.x refuses to read unless
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (`PARQUET_TYPE_ILLEGAL`);
    *    with the conf `ts` already reads as epoch-ns longs — passthrough.
    *  - microsecond fixtures (round-7 driver regeneration): `ts` reads as
    *    `TIMESTAMP_NTZ`; convert via UTC-cast `unix_micros * 1000` (the
    *    session timezone is pinned to UTC by every entrypoint, so the
    *    NTZ→instant cast is the identity on the stored value).
    *
    * The DuckDB oracle mirrors the same unit via `epoch_ns(ts)` /
    * `epoch_us(ts)*1000`, which DuckDB evaluates identically for either
    * physical type (SURVEY.md §2.0 D3). The conf is runtime-settable and
    * must precede the read.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) * CAST(1000 AS BIGINT)"))
    }
  }
}
