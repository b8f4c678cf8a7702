package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout (SURVEY.md §7.4 scale posture): persisting both
  * sides of a hot join bucketed (and sorted) on the join key lets Spark plan
  * the join with NO shuffle — each task reads matching bucket files from
  * both tables. At 100 TB this turns the recurring fact⋈fact join from a
  * full-network shuffle into a local merge; the price is paid once at write
  * time. The reference's per-predicate file organization is the same idea
  * done by hand [RECON: SURVEY.md §1.1 storage-layout row].
  */
object Bucketing {

  /** Persist as a bucketed+sorted managed table (overwrite). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — plans shuffle-free
    * when bucket counts match.
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
