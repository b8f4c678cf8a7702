package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-attribution probe for r7_pagerank (same spirit as ProbeX1):
  * times the edge materialization, node-set distinct, each iteration, and
  * the final decode+sort separately. Run:
  * `SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.ProbeR7 [sfDir]'`. */
object ProbeR7 {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.entry(spark).count() // warm
    (1 to 3).foreach { pass =>
      def t[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[$pass] $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
      }
      val ed = t("edges") { graft.ops.Rdf.r7Edges(spark, sf).localCheckpoint(true) }
      var pr: Option[org.apache.spark.sql.DataFrame] = None
      (1 to graft.ops.Rdf.PageRankIters).foreach { i =>
        pr = Some(t(s"iter$i") {
          graft.ops.Rdf.r7Step(ed, pr.map((_, graft.ops.Rdf.defaultRank(i - 1))))
            .localCheckpoint(true)
        })
      }
      t("final") { graft.BenchAction.exec(
        ed.select(col("src").as("node"))
          .union(ed.select(col("dst").as("node"))).distinct()
          .join(pr.get.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(col("node"),
            coalesce(col("pr"),
              lit(graft.ops.Rdf.defaultRank(graft.ops.Rdf.PageRankIters))).as("pr"))
          .orderBy(col("pr").desc, col("node")).limit(25)) }
    }
    spark.stop()
  }
}
