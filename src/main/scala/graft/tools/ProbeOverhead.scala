package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Decompose a declared query's wall-clock into plan-construction,
  * Catalyst planning, and execution, with job/task counts — the r14-verdict
  * item-2 probe ("profile one representative key end-to-end" before touching
  * the ~200-key sub-second tail whose cost is suspected to be fixed
  * per-query overhead, not data work).
  *
  *   sbt 'runMain graft.tools.ProbeOverhead <sfDir> <reps> <query...>'
  *
  * Columns (min over reps, seconds):
  *   build = fn(spark, sf) — DataFrame/logical-plan construction only
  *   plan  = .queryExecution.executedPlan — analyze + optimize + plan the
  *           read side (the noop write re-plans its own tree, so the exec
  *           column INCLUDES another full planning pass — compare the two
  *           to size Catalyst's share)
  *   exec  = BenchAction.exec (the bench's timed action, full plan)
  *   jobs/tasks = Spark jobs and tasks the exec pass launched
  */
object ProbeOverhead {
  def main(args: Array[String]): Unit = {
    val sf = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.install(spark)
    val jobs = new AtomicLong; val tasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    graft.SparkEntry.entry(spark).count() // warm
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val rows = (1 to reps).map { _ =>
        val preexisting = spark.sparkContext.getPersistentRDDs.keySet
        val t0 = System.nanoTime()
        val df = fn(spark, sf)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        val j0 = jobs.get; val k0 = tasks.get
        graft.BenchAction.exec(df)
        val t3 = System.nanoTime()
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!preexisting.contains(id)) rdd.unpersist(blocking = false)
        }
        (t1 - t0, t2 - t1, t3 - t2, jobs.get - j0, tasks.get - k0)
      }
      def mn(f: ((Long, Long, Long, Long, Long)) => Long): Double =
        rows.map(f).min / 1e9
      println(f"$name%-24s build ${mn(_._1)}%6.3f  plan ${mn(_._2)}%6.3f  " +
        f"exec ${mn(_._3)}%6.3f  jobs ${rows.map(_._4).min}%3d  " +
        f"tasks ${rows.map(_._5).min}%5d")
    }
    spark.stop()
  }
}
