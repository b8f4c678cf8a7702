package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B for [[graft.plans.RowNumberTopK]]'s docstring numbers: the drop-rn
  * top-k idiom at sf0.1, native plan (Spark's InferWindowGroupLimit —
  * partial/final WindowGroupLimit with two sorts around the exchange,
  * then the Window) vs the rule's bare bounded-heap plan (no sorts, one
  * exchange, no window evaluation). Same result set — the spec asserts
  * equality; this measures. Run:
  * `sbt 'runMain graft.tools.ProbeTopK [sfDir]'`.
  */
object ProbeTopK {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // lineitem is the biggest fixture table — top-3 lines per order-ish
    // group key with the rank column dropped (the rule's shape)
    def q: DataFrame = {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
      spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_extendedprice"))
    }
    // round 11: the drop-rank rank() <= k shape (tie-preserving — a
    // NON-total order so boundary ties are real; l_extendedprice repeats
    // within a supplier, so the Rank ties mode's class machinery is
    // genuinely exercised rather than degenerating to the heap path)
    def qRank: DataFrame = {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc)
      spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"),
          rank().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_extendedprice"))
    }
    def time(label: String, df: => DataFrame): Double = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.BenchAction.exec(df)
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$label%-14s $best%6.2f s")
      best
    }
    q.count() // warm
    time("native", q)
    time("native-rank", qRank)
    graft.plans.RowNumberTopK.install(spark)
    println("row_number plan has TopKPerGroup: " +
      q.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    println("rank plan has TopKPerGroup: " +
      qRank.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    time("rule", q)
    time("rule-rank", qRank)
    spark.stop()
  }
}
