package graft

import org.apache.spark.sql.functions._
import graft.functions.ZOrder
import graft.sources.ZOrderLayout

/** Z-order layout: the Morton value interleaves correctly, and the written
  * layout actually has 2-D locality — mean per-file bounding-box area a
  * small fraction of a 1-D sort's.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (matches an in-memory reference)") {
    def ref(a: Int, b: Int): Long =
      (0 until 16).map { i =>
        (((a >> i) & 1).toLong << (2 * i + 1)) | (((b >> i) & 1).toLong << (2 * i))
      }.reduce(_ | _)
    val pairs = Seq((0, 0), (1, 0), (0, 1), (3, 5), (0xFFFF, 0), (0, 0xFFFF),
      (12345, 54321), (65535, 65535))
    val got = pairs.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z")).as[Long].collect()
    got.zip(pairs).foreach { case (z, (a, b)) => assert(z === ref(a, b)) }
  }

  test("z-ordered files have 2-D locality; 1-D sort does not") {
    // two independent uniform dims, 16 files per layout
    val n = 64 * 1024
    val data = spark.range(n.toLong).select(
      pmod(hash(col("id"), lit(1)), lit(4096)).as("a"),
      pmod(hash(col("id"), lit(2)), lit(4096)).as("b"))
    val zdir = java.nio.file.Files.createTempDirectory("graft_z").toString
    ZOrderLayout.writeZOrdered(data, zdir, col("a"), col("b"), 16)
    val sdir = java.nio.file.Files.createTempDirectory("graft_s").toString
    data.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(sdir)
    // the discriminating property (what row-group stats pruning sees):
    // per-file b-range under z-order is far below full width — b-filtered
    // scans skip most files; under the a-sort it stays ~full — b-filtered
    // scans read everything. Both layouts narrow `a` comparably.
    def meanRangeB(path: String): Double =
      spark.read.parquet(path).withColumn("f", input_file_name())
        .groupBy("f").agg((max("b") - min("b")).as("rb"))
        .select(avg("rb")).head().getDouble(0)
    val zb = meanRangeB(zdir)
    val sb = meanRangeB(sdir)
    assert(sb > 0.9 * 4096.0, s"1-D layout unexpectedly narrowed b: $sb")
    assert(zb < 0.5 * 4096.0, s"z-layout failed to narrow b: $zb")
    // same data both layouts
    assert(spark.read.parquet(zdir).count() === n.toLong)
  }
}
