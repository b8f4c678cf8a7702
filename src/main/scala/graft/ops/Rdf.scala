package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** RDF-view queries (SURVEY.md §2.4 r-group) — the reference's data model
  * materialized [RECON: `ahaque/rdf-mapreduce-joins` operates on
  * (subject, predicate, object) triples; its reduce-side joins are
  * subject-subject star joins and subject-object path joins]. We derive the
  * triples view from relational fixtures by unpivot (`stack`), then express
  * the two canonical BGP join shapes as self-joins on the view.
  *
  * Scale note: a triples view multiplies rows by the predicate count but is
  * narrow (3 columns); the self-joins shuffle on `s`/`o` which is exactly the
  * reference's shuffle key [RECON], so the plan is shape-identical at 100 TB.
  */
object Rdf {

  /** (s,p,o) view of `customer` — s: int64 key, p: predicate name, o: string. */
  private def custTriples(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).selectExpr("c_custkey AS s",
      """stack(3, 'name', c_name,
               'nationkey', CAST(c_nationkey AS STRING),
               'mktsegment', c_mktsegment) AS (p, o)""")

  private def nationTriples(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d).selectExpr("CAST(n_nationkey AS BIGINT) AS s",
      """stack(2, 'name', n_name,
               'regionkey', CAST(n_regionkey AS STRING)) AS (p, o)""")

  private def regionTriples(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d).selectExpr("CAST(r_regionkey AS BIGINT) AS s",
      "stack(1, 'name', r_name) AS (p, o)")

  /** r1 — triple-pattern statistics: count + distinct objects per predicate. */
  def r1(s: SparkSession, d: String): DataFrame =
    custTriples(s, d)
      .groupBy(col("p"))
      .agg(count(lit(1)).as("cnt"), countDistinct(col("o")).as("distinct_o"))
      .orderBy("p")

  /** r2 — subject-subject star BGP: reassemble (name, mktsegment, nation)
    * from the triples view with two self-joins on the subject [RECON core:
    * the reference's reduce-side subject join].
    */
  def r2(s: SparkSession, d: String): DataFrame = {
    val t = custTriples(s, d)
    val names = t.filter(col("p") === "name").select(col("s"), col("o").as("c_name"))
    val segs = t.filter(col("p") === "mktsegment")
      .select(col("s").as("s2"), col("o").as("mktsegment"))
    val nk = t.filter(col("p") === "nationkey")
      .select(col("s").as("s3"), col("o").cast("int").as("nk"))
    names
      .join(segs, col("s") === col("s2"))
      .join(nk, col("s") === col("s3"))
      .join(broadcast(Tables.nation(s, d)), col("nk") === col("n_nationkey"))
      .select(col("s").as("custkey"), col("c_name"), col("mktsegment"), col("n_name"))
      .orderBy("custkey")
  }

  /** r4 — OPTIONAL BGP (SPARQL's left-join idiom, the reference's hallmark
    * pattern [RECON]): every customer subject with its name, optionally
    * matched against order subjects pointing at it (`?o <custkey> ?c`);
    * unmatched customers keep a zero count (!bound → 0).
    */
  def r4(s: SparkSession, d: String): DataFrame = {
    val names = custTriples(s, d).filter(col("p") === "name")
      .select(col("s").as("custkey"), col("o").as("c_name"))
    val orderTriples = Tables.orders(s, d).selectExpr(
      "o_orderkey AS s", "'custkey' AS p", "CAST(o_custkey AS STRING) AS o")
    val links = orderTriples
      .select(col("s").as("order_s"), col("o").cast("bigint").as("cust_o"))
    names.join(links, col("custkey") === col("cust_o"), "left_outer")
      .groupBy(col("custkey"), col("c_name"))
      .agg(count(col("order_s")).as("order_cnt"))
      .orderBy("custkey")
  }

  /** r5 — SPARQL property path `locatedIn{1,4}`: transitive closure (to a
    * declared 4-hop bound) over the location edge set c→n ∪ n→r, emitting
    * each reachable (src, dst) with its SHORTEST path length. The bounded
    * path is unrolled into 4 keyed self-joins — plan construction stays
    * fully lazy (no driver-side fixpoint loop inside a declared query; for
    * unbounded-depth graphs use the [[DedupCluster]] iterative idiom, which
    * localCheckpoints per round and only ever surfaces a change count).
    * Each hop is a keyed join on `dst = src`. Only the nation→region edge
    * set is broadcast: a path's `dst` is always an `n*` or `r*` node (no
    * edge points AT a customer), so the corpus-cardinality c→n edges can
    * never extend a path and stay out of the broadcast — the hop relation
    * is dimension-sized (|nation| rows) by construction. On a general
    * graph whose hop relation is corpus-sized, drop the broadcast and let
    * each hop shuffle on the key — the reference's chained-job path join
    * [RECON], generalized to variable length. The oracle expresses the
    * same closure as a DuckDB `WITH RECURSIVE` CTE bounded at depth 4.
    */
  def r5(s: SparkSession, d: String): DataFrame = {
    val cn = Tables.customer(s, d).select(
      concat(lit("c"), col("c_custkey")).as("src"),
      concat(lit("n"), col("c_nationkey")).as("dst"))
    val nr = Tables.nation(s, d).select(
      concat(lit("n"), col("n_nationkey")).as("src"),
      concat(lit("r"), col("n_regionkey")).as("dst"))
    val edges = cn.union(nr)
    // Extension edges must START where some path ENDS; dst ∈ {n*, r*} only,
    // so the hop relation is exactly the tiny n→r set (r has no out-edges).
    val hop = broadcast(nr.select(col("src").as("e_src"), col("dst").as("e_dst")))
    def extend(p: DataFrame): DataFrame =
      p.join(hop, col("dst") === col("e_src"))
        .select(col("src"), col("e_dst").as("dst"),
          (col("depth") + 1).as("depth"))
    val p1 = edges.withColumn("depth", lit(1))
    val p2 = extend(p1); val p3 = extend(p2); val p4 = extend(p3)
    p1.union(p2).union(p3).union(p4)
      .groupBy(col("src"), col("dst"))
      .agg(min(col("depth")).cast("int").as("depth"))
      .orderBy("src", "dst")
  }

  /** r3 — subject-object path BGP: customer → nation → region chained through
    * the triples views (object of one pattern = subject of the next) [RECON
    * core: the reference's chained-job path join].
    */
  def r3(s: SparkSession, d: String): DataFrame = {
    val cnk = custTriples(s, d).filter(col("p") === "nationkey")
      .select(col("s").as("custkey"), col("o").cast("bigint").as("nat_s"))
    val nrk = nationTriples(s, d).filter(col("p") === "regionkey")
      .select(col("s").as("n_s"), col("o").cast("bigint").as("reg_s"))
    val rnm = regionTriples(s, d).filter(col("p") === "name")
      .select(col("s").as("r_s"), col("o").as("region_name"))
    cnk
      .join(broadcast(nrk), col("nat_s") === col("n_s"))
      .join(broadcast(rnm), col("reg_s") === col("r_s"))
      .select(col("custkey"), col("nat_s").as("nationkey"), col("region_name"))
      .orderBy("custkey")
  }

  /** r6 — object in-degree distribution over the FK predicates of the
    * triples view: for each of `nationkey` (customer→nation) and `regionkey`
    * (nation→region), count the subjects pointing at each object, then roll
    * the per-object degrees into a (predicate, degree) → object-count
    * histogram — the degree-distribution statistic every triple-store
    * optimizer keeps [RECON: the reference sizes its reduce-side joins by
    * per-key triple counts; the tree was empty at build time, SURVEY §0].
    *
    * Scale: two keyed aggregations (first on (p, o) — the join-key space,
    * high-cardinality on a real graph — then on the tiny (p, degree) space);
    * never collects a vertex list, so the plan is the 100 TB shape.
    */
  def r6(s: SparkSession, d: String): DataFrame = {
    val fk = custTriples(s, d).filter(col("p") === "nationkey")
      .unionByName(nationTriples(s, d).filter(col("p") === "regionkey"))
    fk.groupBy(col("p"), col("o"))
      .agg(count(lit(1)).as("degree"))
      .groupBy(col("p"), col("degree"))
      .agg(count(lit(1)).as("n_objects"))
      .orderBy("p", "degree")
  }
}
