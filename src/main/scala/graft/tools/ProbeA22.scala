package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B floor probe for a22's two crossing formulations: the declared
  * group-window form (parallelism = group count) vs the range-partitioned
  * two-phase form (parallelism = shuffle width). Same output by
  * construction (CapabilitySpec); this measures which constant is smaller
  * at a given level-frame size.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.ProbeA22 <sfDir> <reps>'
  */
object ProbeA22 {
  def main(args: Array[String]): Unit = {
    val sf = args(0)
    val reps = args(1).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.entry(spark).count() // warm
    def time(label: String, fn: () => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.BenchAction.exec(fn())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-14s ${ts.min}%6.2f min  ${ts.sum / reps}%6.2f avg")
    }
    time("window", () => graft.ops.Aggs.a22(spark, sf))
    time("distributed", () => graft.ops.Aggs.a22Distributed(spark, sf))
    spark.stop()
  }
}
