package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ZOrder

/** Z-ordered parquet layout (SURVEY §2.8 capability tier): range-partition
  * and sort the frame by the Morton value of two clustering columns before
  * writing, so every output file covers a small rectangle of the
  * (a, b) space. Parquet min/max footer statistics then prune row groups
  * for predicates on EITHER column — the layout that keeps a 100 TB table
  * scannable on its two hottest filter dimensions at once, where a 1-D
  * sort only serves one. `ZOrderSpec` measures the locality directly:
  * the mean per-file (a-range × b-range) area under the z-layout must be a
  * small fraction of the 1-D-sorted layout's.
  */
object ZOrderLayout {

  /** Write `df` z-ordered on (a, b) into `files` range-partitioned sorted
    * parquet files. Dimensions are 16-bit; quantile-bucket wider domains
    * first.
    */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
      files: Int): Unit = {
    val zv = ZOrder.zValue(a, b)
    df.withColumn("__z", zv)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
