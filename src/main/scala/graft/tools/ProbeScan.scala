package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scan-path attribution probe for the regenerated star fixtures. */
object ProbeScan {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.lineitem(spark, sf)
    def t[A](name: String)(f: => A): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"$name%-28s run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    println("scan partitions: " + li.rdd.getNumPartitions)
    t("count") { li.count() }
    t("sum(qty) double") { li.agg(sum(col("l_quantity"))).collect() }
    t("sum dec2/dec4 x5") {
      li.groupBy(col("l_returnflag"))
        .agg(sum(graft.Det.dec2(col("l_quantity"))),
          sum(graft.Det.dec2(col("l_extendedprice"))),
          sum(graft.Det.dec4(col("l_quantity") * col("l_quantity"))),
          sum(graft.Det.dec4(col("l_extendedprice") * col("l_extendedprice"))),
          sum(graft.Det.dec4(col("l_quantity") * col("l_extendedprice")))).collect()
    }
    t("f3 full") { graft.BenchAction.exec(graft.ops.Scalars.f3(spark, sf)) }
    t("f3 no sort") {
      graft.BenchAction.exec(graft.ops.Scalars.f3(spark, sf).sortWithinPartitions("l_orderkey"))
    }
    t("scan all cols noop") { graft.BenchAction.exec(li) }
    // attribution: f3's projection with builtin round vs a float-math round
    val raw = li.select(col("l_orderkey"), col("l_linenumber"),
      (col("l_extendedprice") * 0.01).as("a"),
      sqrt(col("l_quantity")).as("b"),
      abs(col("l_discount") - 0.05).as("c"),
      log(col("l_extendedprice")).as("d"),
      exp(col("l_discount")).as("e"))
    t("proj no round") { graft.BenchAction.exec(raw) }
    t("proj builtin round x5") { graft.BenchAction.exec(
      raw.select(round(col("a"), 4), round(col("b"), 4), round(col("c"), 4),
        round(col("d"), 4), round(col("e"), 4))) }
    def fastR(c: org.apache.spark.sql.Column) = {
      val w = abs(c) * lit(10000.0)
      floor(w + lit(0.5)).cast("double") / lit(10000.0) * signum(c)
    }
    t("proj float round x5") { graft.BenchAction.exec(
      raw.select(fastR(col("a")), fastR(col("b")), fastR(col("c")),
        fastR(col("d")), fastR(col("e")))) }
    spark.stop()
  }
}
