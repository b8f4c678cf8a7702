package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Does an eager localCheckpoint PRESERVE outputPartitioning, so a
  * pre-partitioned loop-invariant frame lets per-round keyed joins skip
  * their exchange? (r15; guide §2.4 co-location.) Prints the joined plan
  * with and without pre-partitioning — count the Exchanges.
  */
object ProbePartCkpt {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val e = (1 to 100000).map(i => (i % 1000, i)).toDF("u", "v")
    val small = (1 to 500).map(i => (i, i * 10)).toDF("n", "x")
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    val plain = graft.Ckpt(e)
    val pre = graft.Ckpt(e.repartition(col("u")))
    val preN = graft.Ckpt(e.repartition(cpus.toInt, col("u")))
    val jPlain = plain.join(small.hint("SHUFFLE_HASH"), col("u") === col("n"))
    val jPre = pre.join(small.hint("SHUFFLE_HASH"), col("u") === col("n"))
    val aggPre = pre.groupBy("u").count()
    println("== plain ckpt join exchanges: " +
      plan(jPlain).split("\n").count(_.contains("Exchange")))
    println("== pre-part ckpt join exchanges: " +
      plan(jPre).split("\n").count(_.contains("Exchange")))
    println("== pre-part agg exchanges: " +
      plan(aggPre).split("\n").count(_.contains("Exchange")))
    val preC = graft.Ckpt.shared(e.repartition(cpus.toInt, col("u")))
    preC.write.format("noop").mode("overwrite").save() // materialize cache
    val jPreC = preC.join(small.hint("SHUFFLE_HASH"), col("u") === col("n"))
    println("== persist join exchanges: " +
      plan(jPreC).split("\n").count(_.contains("Exchange")))
    println("== persist agg exchanges: " +
      plan(preC.groupBy("u").count()).split("\n").count(_.contains("Exchange")))
    println(plan(jPreC))
    val jPreN = preN.join(small.hint("SHUFFLE_HASH"), col("u") === col("n"))
    println("== preN join exchanges: " +
      plan(jPreN).split("\n").count(_.contains("Exchange")))
    println("== preN agg exchanges: " +
      plan(preN.groupBy("u").count()).split("\n").count(_.contains("Exchange")))
    println(plan(jPre))
    spark.stop()
  }
}
