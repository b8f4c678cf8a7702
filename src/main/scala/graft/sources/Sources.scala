package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV/JSON source+sink support (SURVEY.md §2.9 capability; the reference's
  * TextInputFormat/TextOutputFormat analog [RECON]). Schemas are always
  * explicit on read — schema inference is a full extra pass over the data and
  * is non-deterministic under promotion, both unacceptable at 100 TB.
  */
object Sources {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC source/sink (Spark-native reader/writer): the columnar alternative
    * when the lake standardizes on ORC — same pushdown/pruning behavior as
    * parquet through the same FileFormat machinery.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Hive-style partitioned parquet layout: one directory per partition
    * value, so a filter on the partition column prunes whole directories at
    * planning time — the coarsest and cheapest pushdown there is at 100 TB
    * (the scan never even lists the excluded data). Partition columns should
    * be low-cardinality (lang, date, label); high-cardinality keys belong in
    * bucketing instead (see Bucketing).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
