package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-8 plan probe: print the formatted physical plans of the five new
  * declared queries so the shapes (one keyed window for s9, keyed agg+join
  * for x29, TakeOrderedAndProject for x31, salted join for j13) can be
  * eyeballed beyond what PlanLintSpec asserts mechanically.
  */
object ProbeR8 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("s9_rate_window", "x29_chunk_dedup", "x30_token_entropy",
        "x31_bpe_pairs", "j13_salted_skew").foreach { q =>
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, d)
        .queryExecution.executedPlan.toString.take(3500))
    }
    spark.stop()
  }
}
