package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual declared queries (warm, repeated): sbt 'runMain
  * graft.tools.Profile <sfDir> <n> <query...>'.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sf = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // shuffle width decoupled from thread count so partition-scaling
    // hypotheses are testable (e.g. does a query's super-linear tail at a
    // synthetic 8x corpus vanish when partitions scale with the data?)
    val shuf = sys.env.getOrElse("SPARK_GRAFT_SHUF", cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_EXT=1 → install GraftExtensions (Bench/Verify's session
    // shape) so rule-riding queries (w11/w12/j19/j20...) profile the same
    // plan the driver scores; default stays vanilla for comparability
    // with the floors recorded before this flag existed
    if (sys.env.get("SPARK_GRAFT_EXT").contains("1"))
      graft.GraftExtensions.install(spark)
    graft.SparkEntry.entry(spark).count() // warm
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val preexisting = spark.sparkContext.getPersistentRDDs.keySet
        val t0 = System.nanoTime()
        graft.BenchAction.exec(fn(spark, sf)) // full plan, not count-pruned
        val t = (System.nanoTime() - t0) / 1e9
        // release only the Ckpt'd blocks THIS rep created (Bench.once's
        // discipline — a blanket unpersist would invalidate any future
        // cross-query cache silently)
        spark.sparkContext.getPersistentRDDs
          .foreach { case (id, rdd) =>
            if (!preexisting.contains(id)) rdd.unpersist(blocking = false)
          }
        spark.catalog.clearCache() // Bench.once's round-15 isolation rule
        t
      }
      // untimed, display only — but it still creates Ckpt'd blocks, and
      // under the snapshot-scoped unpersist above those would land in every
      // LATER query's `preexisting` set and never be released (memory
      // pressure skewing later timings); release its delta the same way
      val preDisplay = spark.sparkContext.getPersistentRDDs.keySet
      val rows = fn(spark, sf).count()
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) =>
          if (!preDisplay.contains(id)) rdd.unpersist(blocking = false)
        }
      spark.catalog.clearCache()
      println(f"$name%-22s ${times.min}%6.2f min  " +
        f"${times.sum / reps}%6.2f avg  $rows%d rows")
    }
    spark.stop()
  }
}
