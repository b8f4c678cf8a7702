package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage-attribution probe for x1 at the m8 stress corpus. */
object ProbeX1 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/tmp/graft-scale/m8"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.install(spark)

    def time(name: String)(f: => DataFrame): Unit = {
      // min of 2 back-to-back (attribution coarse; looking for 10x effects)
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.BenchAction.exec(f)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s ${ts.min}%8.2f s")
    }

    val full = graft.ops.Pipeline.x1(spark, d)
    time("full")(full)
    // full minus the final global sort
    time("no_final_sort")(graft.ops.Pipeline.x1(spark, d)
      .sortWithinPartitions("lang", "a_id", "b_id"))
    // verify join output but WITHOUT computing jaccard (sets still shuffled)
    val parts = graft.ops.Pipeline.x1Parts(spark, d)
    time("cand_only")(parts("cand"))
    time("verify_no_inter")(parts("verify_no_inter"))
    time("verify_sets_no_inter")(parts("verify_sets_no_inter"))
    spark.stop()
  }
}
