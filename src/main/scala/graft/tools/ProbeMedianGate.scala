package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Calibrate the a20/a22 crossing gate (r15): time the group-window vs the
  * range-partitioned distributed cumulative-sum crossing over SYNTHETIC
  * level frames of increasing level count, and verify the two agree.
  * sbt 'runMain graft.tools.ProbeMedianGate <nLevels...>'
  */
object ProbeMedianGate {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong) else
      Array(1000000L, 2000000L, 8000000L, 20000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sizes.foreach { n =>
      // 3 flags, n distinct (flag, value) levels, deterministic weights
      val levels = graft.Ckpt(spark.range(n).select(
        (col("id") % 3).cast("string").as("l_returnflag"),
        col("id").as("v"),
        (col("id") % 7 + 1).as("w")))
      def run(mk: => org.apache.spark.sql.DataFrame): (Double, String) = {
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          graft.BenchAction.exec(mk)
          (System.nanoTime() - t0) / 1e9
        }
        (ts.min, mk.collect().sortBy(_.getString(0)).mkString("|"))
      }
      def aggOf(cum: org.apache.spark.sql.DataFrame) = cum
        .filter(col("cum") * 2 >= col("tot"))
        .groupBy(col("l_returnflag"))
        .agg(min(col("v")).as("med"), max(col("tot")).as("n"))
      val (tw, rw) = run(aggOf(graft.ops.Aggs.cumLevelsWindow(levels, "v")))
      val (td, rd) = run(aggOf(graft.ops.Aggs.cumLevelsDistributed(levels, "v")))
      require(rw == rd, s"crossing results diverge at n=$n")
      println(f"n=$n%-10d window ${tw}%6.2f s   distributed ${td}%6.2f s   equal=true")
      levels.unpersist(blocking = true)
      spark.sparkContext.getPersistentRDDs.foreach(_._2.unpersist(blocking = false))
    }
    spark.stop()
  }
}
