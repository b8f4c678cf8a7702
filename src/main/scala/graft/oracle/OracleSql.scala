package graft.oracle

/** DuckDB oracle SQL, one entry per declared query (SURVEY.md §2.9).
  *
  * Every string mirrors its Spark twin under the determinism rules D1–D8:
  * identical column names/order, decimal casts before aggregation, dates as
  * DATE, event-time math on `epoch_ns(ts)` int64 (the Spark side reads ns
  * parquet as LongType), floats rounded to 4 dp and ranked by the rounded
  * value, explicit NULLS FIRST on nullable sort keys.
  */object OracleSql {

  /** The full 220-key oracle table, aggregated from the per-family slices
    * (ContractSpec asserts key-set equality with SparkEntry.queries, so a
    * slice dropped from this concatenation fails compile-adjacent, not in
    * the driver). */
  val sql: Map[String, String] =
    OracleSqlCoreAggs.sql ++ OracleSqlJoins.sql ++ OracleSqlGraph.sql ++
    OracleSqlScalars.sql ++ OracleSqlEvents.sql ++ OracleSqlLlm.sql ++
    OracleSqlX1.sql ++ OracleSqlX2.sql
}
