package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Floor-cost microprobe (r15): what does ONE Spark job / one shuffle /
  * one global sort cost in this session shape, independent of any real
  * query? Run: sbt 'runMain graft.tools.ProbeJobFloor <sfDir> <reps>'.
  */
object ProbeJobFloor {
  def main(args: Array[String]): Unit = {
    val sf = args(0); val reps = args(1).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.install(spark)
    graft.SparkEntry.entry(spark).count() // warm
    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.BenchAction.exec(mk)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-34s min ${ts.min}%6.3f avg ${ts.sum / reps}%6.3f")
    }
    time("range_noop (0 shuffle)")(spark.range(1000).toDF("i"))
    time("range_agg (1 shuffle)")(
      spark.range(1000).toDF("i").groupBy(col("i") % 10).count())
    time("range_agg_sorted (1 shuf + sort)")(
      spark.range(1000).toDF("i").groupBy((col("i") % 10).as("k")).count()
        .orderBy("k"))
    time("scan_noop (parquet, 0 shuffle)")(
      graft.Tables.nation(spark, sf))
    time("scan_li_noop (lineitem scan)")(
      graft.Tables.lineitem(spark, sf).select(col("l_orderkey")))
    time("scan_li_agg_sorted")(
      graft.Tables.lineitem(spark, sf).groupBy("l_returnflag").count()
        .orderBy("l_returnflag"))
    time("ckpt_only (1 localCheckpoint)")(
      graft.Ckpt(spark.range(1000).toDF("i")))
    spark.stop()
  }
}
