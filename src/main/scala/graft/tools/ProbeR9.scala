// Round-8 continuation plan probe: join/exchange structure of the six new
// declared queries (w8/a19/j14/j15/r9/r10). Run:
//   sbt 'runMain graft.tools.ProbeR9 [sfDir]'
package graft.tools

import org.apache.spark.sql.SparkSession

object ProbeR9 {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq("j15_interval_overlap", "r9_triangles", "r10_bipartite_proj",
        "j14_fuzzy_join", "w8_ntile_spend", "a19_interp_fill")) {
      println(s"\n===== $n =====")
      val p = graft.SparkEntry.queries(n)(spark, sf)
        .queryExecution.sparkPlan.toString
      p.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange")
          || l.contains("Broadcast") || l.contains("TopK"))
        .foreach(l => println(l.take(160)))
    }
    spark.stop()
  }
}
