package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Det._

/** Scan / filter / sort / set-operation queries (SURVEY.md §2.1, §2.3).
  *
  * Reference analog [RECON]: the mapper-side scan+projection+filter of the
  * hand-coded MapReduce jobs. Here the scan is declarative so Catalyst pushes
  * both the predicates and the projection into the Parquet reader.
  */
object Core {

  /** c1 — projection scan. Scale note: column pruning means only the five
    * referenced columns are read off disk; no shuffle at all.
    */
  def c1(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), asDate(col("l_shipdate")).as("ship_date"))
      // (l_orderkey, l_linenumber) is NOT unique in the fixture: sort by all
      // output columns so equal-key rows are interchangeable (rule D1).
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "ship_date")

  /** c2 — conjunctive/disjunctive predicate pushdown: BETWEEN + IN + LIKE +
    * numeric compare. All four predicate shapes reach the Parquet scan.
    */
  def c2(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(asDate(col("l_shipdate")).between("1996-01-01", "1996-12-31")
        && (col("l_quantity").isin(1.0, 2.0, 3.0, 4.0, 5.0)
          || col("l_extendedprice") > 50000.0)
        && col("l_returnflag").like("N%"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"), col("l_extendedprice"),
        asDate(col("l_shipdate")).as("ship_date"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "ship_date")

  /** a6 — total order + LIMIT/OFFSET (rule D6: only after a provably unique
    * sort key). Spark plans this as a global sort + CollectLimit; at cluster
    * scale a top-k this small is a per-partition partial top-k then merge.
    */
  def a6(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"),
        asDate(col("o_orderdate")).as("order_date"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(10).limit(50)

  /** a7 — UNION (distinct) + UNION ALL in one output: distinct nation keys
    * present among customers or suppliers, with the UNION ALL occurrence
    * count. `Dataset.union` is UNION ALL; `.distinct()` gives set semantics.
    */
  def a7(s: SparkSession, d: String): DataFrame = {
    val c  = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
    val su = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
    val distinctKeys = c.union(su).distinct()
    val counts = c.union(su).groupBy("nationkey").agg(count(lit(1)).as("cnt"))
    distinctKeys.join(counts, "nationkey").orderBy("nationkey")
  }

  /** a8 — INTERSECT (distinct set semantics match DuckDB, verified SURVEY
    * §2.0): part brands shipped in both 1995 and 1996.
    */
  def a8(s: SparkSession, d: String): DataFrame = {
    def brands(y: Int): DataFrame =
      Tables.lineitem(s, d)
        // pushdown-friendly range predicate (year() would not reach the scan)
        .filter(col("l_shipdate") >= s"$y-01-01" && col("l_shipdate") < s"${y + 1}-01-01")
        // distinct partkeys BEFORE the dim join: the join then processes
        // |parts| rows, not |lineitems| (intersect dedups anyway, so the
        // early distinct is result-neutral)
        .select(col("l_partkey")).distinct()
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"))
    brands(1995).intersect(brands(1996)).orderBy("p_brand")
  }

  /** a9 — EXCEPT: parts shipped in 1995 but not 1996 (part-key level; the
    * brand-level variant is empty on the fixtures).
    */
  def a9(s: SparkSession, d: String): DataFrame = {
    def shipped(y: Int): DataFrame =
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= s"$y-01-01" && col("l_shipdate") < s"${y + 1}-01-01")
        .select(col("l_partkey"))
    shipped(1995).except(shipped(1996)).orderBy("l_partkey")
  }
}
