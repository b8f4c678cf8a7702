package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r21 peel-convergence probe: per round, the low-support (removed) edge
  * count at the given SF — decides whether the round-15 early-exit fires.
  * sbt 'runMain graft.tools.ProbeR21 <sfDir>'
  */
object ProbeR21 {
  def main(args: Array[String]): Unit = {
    val sf = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e0 = graft.Ckpt(graft.ops.Rdf.coEdges(spark, sf))
    println(s"edges: ${e0.count()}")
    var tri = graft.Ckpt(graft.ops.RdfProbe.oriented(e0))
    println(s"triangles: ${tri.count()}")
    var sup = graft.Ckpt(graft.ops.RdfProbe.support(tri))
    for (r <- 1 to 4) {
      val low = sup.filter(col("sup") < 2)
        .select(col("u").as("lu"), col("v").as("lv"))
      val n = low.count()
      println(s"round $r: low=$n sup_rows=${sup.count()}")
      if (n > 0) {
        def anti(t: org.apache.spark.sql.DataFrame, x: String, y: String) =
          t.join(low, least(col(x), col(y)) === col("lu") &&
            greatest(col(x), col(y)) === col("lv"), "left_anti")
        tri = graft.Ckpt(anti(anti(anti(tri, "a", "b"), "a", "c"), "b", "c"))
        sup = graft.Ckpt(graft.ops.RdfProbe.support(tri))
      }
    }
    spark.stop()
  }
}
