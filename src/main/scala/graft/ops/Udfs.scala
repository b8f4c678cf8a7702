package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Det._

/** User-defined function surface (SURVEY.md §2.7): scalar UDF, typed
  * Aggregator UDAF, and a generator (UDTF-shaped) query. The UDAF keeps its
  * buffer in BigDecimal so partial aggregation stays exact under any
  * partitioning (the same reason a1 casts to decimal before summing).
  */
object Udfs {

  /** u1 — registered scalar UDF: net price score. The UDF computes the raw
    * double (same IEEE ops in the same order as the oracle); the output is
    * quantized to DECIMAL(18,6) — the true product of 2-dp inputs is exactly
    * 6-dp, so the cast is tie-free in both engines (a round(,2) would sit on
    * the half-up boundary for a structured subset of rows).
    */
  def u1(s: SparkSession, d: String): DataFrame = {
    val score = udf((px: Double, disc: Double, tax: Double) =>
      (px * (1.0 - disc)) * (1.0 + tax))
    s.udf.register("price_score", score)
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        score(col("l_extendedprice"), col("l_discount"), col("l_tax"))
          .cast("decimal(18,6)").cast("double").as("score"))
      .orderBy("l_orderkey", "l_linenumber", "score")
  }

  case class WIn(px: Double, w: Double)

  /** Discount-weighted average price. Buffer = (Σ px·w, Σ w) in exact
    * decimals quantized to 4 dp on entry — mirrors the oracle's
    * CAST(x AS DECIMAL(18,4)) so partials merge associatively.
    */
  object WAvg extends Aggregator[WIn, (BigDecimal, BigDecimal), Double] {
    private def d4(x: Double): BigDecimal =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))
    def reduce(b: (BigDecimal, BigDecimal), a: WIn): (BigDecimal, BigDecimal) =
      (b._1 + d4(a.px) * d4(a.w), b._2 + d4(a.w))
    def merge(b1: (BigDecimal, BigDecimal), b2: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
      (b1._1 + b2._1, b1._2 + b2._2)
    def finish(b: (BigDecimal, BigDecimal)): Double =
      // zero total weight → NaN (BigDecimal(NaN) would throw and kill the job)
      if (b._2.signum == 0) Double.NaN
      else {
        // EXACT rational half-up at 4 dp: r = ⌊(2N + D) ∕ 2D⌋ with
        // N = num·10⁸ and D = den·10⁴ integral by construction (the buffer
        // holds scale-8/scale-4 decimals). Rounding the double quotient
        // instead (the round-8 form) diverges from DuckDB's ROUND ~1 in
        // 10⁴ here: quantized decimal inputs concentrate quotients ON the
        // .00005 boundaries, where shortest-repr HALF_UP and DuckDB's
        // round disagree — u8's 54k-row window surfaced it at sf0.01.
        // The oracle states the same integer formula (HUGEINT-safe).
        val n = b._1.bigDecimal.movePointRight(8).toBigIntegerExact
        val dd = b._2.bigDecimal.movePointRight(4).toBigIntegerExact
        val two = java.math.BigInteger.TWO
        val r = n.multiply(two).add(dd).divide(dd.multiply(two))
        r.doubleValue / 1e4
      }
    def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
      Encoders.product[(BigDecimal, BigDecimal)]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** u2 — custom Aggregator[IN,BUF,OUT] used as an untyped UDAF. */
  def u2(s: SparkSession, d: String): DataFrame = {
    val wavg = udaf(WAvg, Encoders.product[WIn])
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(wavg(col("l_extendedprice"), col("l_discount")).as("wavg_price"))
      .orderBy("c_mktsegment")
  }

  /** u3 — generator (Catalyst Generate): per-order installment rows via
    * explode(sequence(...)) on a bounded integer.
    */
  def u3(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        explode(sequence(lit(1L), (col("o_orderkey") % 3) + 1)).as("installment"))
      .orderBy("o_orderkey", "installment")

  /** u4 — OUTER generator (posexplode_outer): a row whose array is EMPTY
    * still emits one (null, null) row — the outer-generate semantics a plain
    * explode silently drops (§2.7 gap). Array length p_partkey % 3 makes
    * every third part hit the empty case. Narrow Generate node; Spark's
    * default ascending sort is NULLS FIRST and the oracle says so
    * explicitly (DuckDB defaults NULLS LAST).
    */
  def u4(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        slice(split(col("p_name"), " "), lit(1), (col("p_partkey") % 3).cast("int")).as("arr"))
      .select(col("p_partkey"), posexplode_outer(col("arr")))
      .select(col("p_partkey"), col("pos").cast("bigint").as("pos"),
        col("col").as("word"))
      .orderBy("p_partkey", "pos")

  /** Monotone suffix for per-call temp-view names (u5) — same discipline
    * as Joins.viewSeq. */
  private val viewSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** u5 — SQL-defined scalar function (Spark 4 `CREATE FUNCTION ... RETURN
    * expr`): the catalog-function tier of the UDF surface — the function
    * body is a SQL EXPRESSION, so Catalyst inlines it into the plan and it
    * stays inside whole-stage codegen (no JVM-closure serialization, no
    * codegen break — the reason to prefer SQL UDFs over u1's scala `udf`
    * whenever the logic is expressible). The oracle states the inlined
    * expression directly, which is exactly what the optimizer sees.
    * Decimal quantization before the sum (a1's D2 discipline).
    */
  def u5(s: SparkSession, d: String): DataFrame = {
    s.sql("CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(" +
      "p DOUBLE, disc DOUBLE) RETURNS DOUBLE RETURN p * (1.0 - disc)")
    val lv = s"lineitem_u5_${viewSeq.incrementAndGet()}"
    Tables.lineitem(s, d).createOrReplaceTempView(lv)
    try s.sql(
      s"""SELECT l_returnflag,
         | CAST(CAST(SUM(CAST(graft_disc_price(l_extendedprice, l_discount)
         |   AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc,
         | COUNT(*) AS cnt
         |FROM $lv GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    finally s.catalog.dropTempView(lv)
  }

  case class VecIn(emb: Seq[Double])

  /** Element-wise embedding centroid: the ARRAY-VALUED Aggregator (u2 is the
    * scalar-valued one) every vector pipeline needs (k-means means step,
    * cluster profiling, embedding pooling). Buffer = per-dimension sums as
    * 10⁻⁶-scaled longs (each element quantized to DECIMAL(18,6) on entry —
    * exact integer partials merge associatively under any partitioning,
    * u2/a1's D2 discipline; |e| ≤ 1 and corpus ≤ 2⁴³ rows keeps the scaled
    * sum far from Long range). `finish` converts the exact scaled sum to
    * double (one correctly-rounded division), divides by count, rounds
    * half-up 4-dp and normalizes -0 — the same op sequence as the oracle's
    * `ROUND(CAST(SUM(v) AS DOUBLE) / cnt, 4) + 0.0`.
    */
  object Centroid extends Aggregator[VecIn, (Array[Long], Long), Seq[Double]] {
    def zero: (Array[Long], Long) = (Array.empty[Long], 0L)
    def reduce(b: (Array[Long], Long), a: VecIn): (Array[Long], Long) = {
      val sums = if (b._1.nonEmpty) b._1 else new Array[Long](a.emb.length)
      // Ragged input fails LOUDLY and identically under any partitioning:
      // without this, a longer later row would throw AIOOBE only when it
      // isn't the partition's first row (order-dependent), and a shorter
      // one would silently sum a prefix.
      require(a.emb.length == sums.length,
        s"Centroid: ragged embedding (got ${a.emb.length}, expected ${sums.length})")
      var i = 0
      while (i < a.emb.length) {
        sums(i) += (BigDecimal(a.emb(i))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP) * BigDecimal(1000000L))
          .toLongExact
        i += 1
      }
      (sums, b._2 + 1)
    }
    def merge(b1: (Array[Long], Long), b2: (Array[Long], Long)): (Array[Long], Long) =
      if (b1._1.isEmpty) b2
      else if (b2._1.isEmpty) b1
      else {
        // zip would silently truncate mismatched partials — guard instead
        require(b1._1.length == b2._1.length,
          s"Centroid: merging partials of dims ${b1._1.length} vs ${b2._1.length}")
        (b1._1.zip(b2._1).map { case (x, y) => x + y }, b1._2 + b2._2)
      }
    def finish(b: (Array[Long], Long)): Seq[Double] =
      b._1.toSeq.map { s =>
        BigDecimal(s.toDouble / 1e6 / b._2)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      }
    def bufferEncoder: Encoder[(Array[Long], Long)] =
      Encoders.product[(Array[Long], Long)]
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** u6 — array-valued UDAF: per-label embedding centroid (count + 64-dim
    * 4-dp mean vector). ONE keyed shuffle; the buffer is 520 bytes per
    * group regardless of group size. The AGGREGATION is array-valued (the
    * declared point); the DECLARED OUTPUT is the posexploded long format
    * `(label, n_vecs, dim, c)` — scalar, pandas-stable columns per D9
    * (the round-8 array output was ungradable by the driver's comparator).
    */
  def u6(s: SparkSession, d: String): DataFrame = {
    val cent = udaf(Centroid, Encoders.product[VecIn])
    Tables.embeddings(s, d)
      .select(col("label"), col("embedding").cast("array<double>").as("emb"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"), cent(col("emb")).as("centroid"))
      .select(col("label"), col("n_vecs"),
        posexplode(col("centroid")).as(Seq("dim", "c")))
      .orderBy("label", "dim")
  }

  /** u7 — TYPED Dataset groupByKey + mapGroups (the Encoder-backed typed
    * API the u-group exists to prove; u2's Aggregator is the typed AGG
    * path, this is the typed whole-group path): per-nation customer count,
    * exact balance total and custkey extrema, computed imperatively over
    * each group's iterator. The balance accumulates in java BigDecimal —
    * exact arithmetic is ORDER-INDEPENDENT, so the group iterator's
    * nondeterministic order cannot change the result (the same reason u2
    * keeps its buffer in BigDecimal).
    *
    * Scale: groupByKey shuffles once on the nation key; per-group state is
    * four scalars. mapGroups forgoes codegen — the declared point IS the
    * typed API surface; the identical result is one `groupBy.agg` away
    * (the oracle states it) when codegen matters more than types.
    */
  def u7(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds = Tables.customer(s, d)
      .select(col("c_nationkey").cast("int"), col("c_custkey").cast("long"),
        dec2(col("c_acctbal")).as("bal"))
      .as[(Int, Long, java.math.BigDecimal)]
    ds.groupByKey(_._1)
      .mapGroups { (nk, it) =>
        var n = 0L
        var tot = java.math.BigDecimal.ZERO
        var minK = Long.MaxValue
        var maxK = Long.MinValue
        it.foreach { case (_, ck, bal) =>
          n += 1
          tot = tot.add(bal)
          if (ck < minK) minK = ck
          if (ck > maxK) maxK = ck
        }
        (nk, n, tot.setScale(2).doubleValue, minK, maxK)
      }
      .toDF("c_nationkey", "n_cust", "total_bal", "min_custkey", "max_custkey")
      .orderBy("c_nationkey")
  }

  /** u8 — custom Aggregator as a WINDOW function: [[WAvg]] (u2's typed
    * UDAF) evaluated over a running per-supplier frame — the third and
    * last UDAF execution surface after grouped (u2) and grouped-typed
    * (u7). Spark runs the TypedImperativeAggregate incrementally inside
    * WindowExec's UnboundedPreceding frame (one buffer per partition,
    * update-per-row — no per-row recompute), so the shape is one keyed
    * shuffle + one sorted pass, identical in cost to a built-in running
    * SUM.
    *
    * Determinism: zero-discount rows are filtered first (a running weight
    * sum of 0 is NaN on one engine, NULL on the other); the window order
    * key extends to (price, discount) so any remaining order ties are
    * between rows IDENTICAL in every aggregated field — the running value
    * sequence is tie-order invariant. Partition length is fixture-bounded
    * (lineitems per supplier is ~constant across SF), so the window never
    * concentrates a corpus on one key.
    */
  def u8(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wavg = udaf(WAvg, Encoders.product[WIn])
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("ship_date"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, d)
      .filter(col("l_discount") > 0)
      .select(col("l_suppkey"), col("l_shipdate").cast("date").as("ship_date"),
        col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount"))
      .withColumn("run_wavg",
        wavg(col("l_extendedprice"), col("l_discount")).over(w))
      .select(col("l_suppkey"), col("ship_date"), col("l_orderkey"),
        col("l_linenumber"), col("run_wavg"))
      .orderBy("l_suppkey", "ship_date", "l_orderkey", "l_linenumber",
        "run_wavg")
  }

  case class Ev(user_id: Long, event_id: Long, ts: Long, event_type: String,
    value: Double)

  /** u9 — typed `reduceGroups` ARGMAX: each user's single highest-value
    * event via `KeyValueGroupedDataset.reduceGroups` — the typed-API
    * surface u7's `mapGroups` does not cover (reduce is a COMBINABLE
    * binary op: Spark runs it map-side per partition before the shuffle,
    * so per-group traffic is ONE row however many events a user has —
    * the typed twin of max_by). Total order: value desc, then ts asc,
    * then event_id asc (D6 — value ties across events are possible at
    * 2-dp fixture values), so the reduction is associative-safe under any
    * combine order. Output columns are raw COPIES of the winning row
    * (bit-identical on both engines); the oracle states the same argmax
    * as a ROW_NUMBER() = 1 window.
    */
  def u9(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        col("value"))
      .as[Ev]
    def better(a: Ev, b: Ev): Ev =
      if (a.value != b.value) { if (a.value > b.value) a else b }
      else if (a.ts != b.ts) { if (a.ts < b.ts) a else b }
      else if (a.event_id < b.event_id) a else b
    ds.groupByKey(_.user_id)
      .reduceGroups(better _)
      .map(_._2)
      .select(col("user_id"), col("event_id").as("top_event_id"),
        col("event_type").as("top_type"), col("value").as("top_value"))
      .orderBy("user_id")
  }

  /** u10 — typed `flatMapGroups` GAP EMISSION: per user, every
    * inter-event gap longer than one hour becomes an output ROW — the
    * 0-to-N-rows-per-group surface that completes the
    * `KeyValueGroupedDataset` trio (u7 `mapGroups` = exactly-1,
    * u9 `reduceGroups` = combinable-1, this = arbitrary fan-out). The
    * session-boundary/outage-detection shape: SQL needs a LAG window +
    * filter for it (the oracle states exactly that), while the typed face
    * emits during a single forward scan of the sorted group.
    *
    * Determinism: events sort by (ts_us, event_id) inside the group (D6);
    * equal-timestamp neighbours yield gap 0 and can never pass the
    * threshold, so the emitted (start, end) pairs are unique per user and
    * the output order total. All math exact integer µs (D3).
    *
    * Scale: one user-keyed shuffle (groupByKey); per-group state is the
    * user's event list (fixture-bounded ~events/user, the same bound
    * u7/s12 carry) sorted in-memory — at a 100 TB event log with
    * pathological single-user fan-in the group sort is the documented
    * pressure point and the remedy is a secondary-sort formulation
    * (repartitionAndSortWithinPartitions), identical output.
    */
  def u10(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val thresholdUs = 3600L * 1000000L
    val ds = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"))
      .as[(Long, Long, Long)]
    ds.groupByKey(_._1)
      .flatMapGroups { (u: Long, it: Iterator[(Long, Long, Long)]) =>
        val evs = it.toArray.sortBy(e => (e._3, e._2))
        (1 until evs.length).iterator.collect {
          case i if evs(i)._3 - evs(i - 1)._3 > thresholdUs =>
            (u, evs(i - 1)._3, evs(i)._3, evs(i)._3 - evs(i - 1)._3)
        }
      }
      .toDF("user_id", "gap_start_us", "gap_end_us", "gap_us")
      .orderBy("user_id", "gap_start_us")
  }

  /** u11 — typed COGROUP (the KeyValueGroupedDataset surface u7/u9/u10
    * leave uncovered): orders and their lineitems co-grouped on the order
    * key, emitting a per-order reconciliation row — item count, gross
    * lineitem mass (Σ l_extendedprice, exact BigDecimal like u7's buffer)
    * and its delta against o_totalprice. Orders with NO lineitems emit with
    * zero mass (the left-outer face a SQL join would need a COALESCE for);
    * orphan lineitem groups are impossible under referential containment
    * and emit nothing. Cogroup shuffles BOTH sides by the key once —
    * the same exchange plan as the SQL outer-join+agg, with the per-key
    * merge logic in typed code where a real reconciler (schema'd diffs,
    * tolerance bands) actually lives.
    *
    * Money parity: inputs are dec2-quantized; sums/deltas are exact
    * scale-2 BigDecimal arithmetic, output as double (u7's discipline).
    */
  def u11(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val os = Tables.orders(s, d)
      .select(col("o_orderkey").cast("long"), dec2(col("o_totalprice")))
      .as[(Long, java.math.BigDecimal)]
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").cast("long"), dec2(col("l_extendedprice")))
      .as[(Long, java.math.BigDecimal)]
    os.groupByKey(_._1).cogroup(li.groupByKey(_._1)) { (k, oIt, lIt) =>
      oIt.map { case (_, total) =>
        var n = 0L
        var gross = java.math.BigDecimal.ZERO
        lIt.foreach { case (_, px) => n += 1; gross = gross.add(px) }
        (k, n, total.setScale(2).doubleValue,
          gross.setScale(2).doubleValue,
          total.subtract(gross).setScale(2).doubleValue)
      }
    }
      .toDF("o_orderkey", "n_items", "o_total", "li_gross", "delta")
      .orderBy("o_orderkey")
  }

  /** u12 — typed `joinWith` (the pair-preserving Dataset join the u-group
    * still lacked): orders ⨝ customer as a Dataset[(order, customer)] of
    * INTACT typed pairs — the surface that keeps both sides' objects
    * whole through the join (a flat DataFrame join erases the boundary),
    * then one typed map to the flat output. Plans as the same equi-join
    * exchange as the SQL face; money through dec2 → double (u7's
    * discipline).
    */
  def u12(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val os = Tables.orders(s, d)
      .select(col("o_orderkey").cast("long").as("ok"),
        col("o_custkey").cast("long").as("ck"),
        dec2(col("o_totalprice")).as("total"))
      .as[(Long, Long, java.math.BigDecimal)]
    val cs = Tables.customer(s, d)
      .select(col("c_custkey").cast("long").as("cck"), col("c_name"))
      .as[(Long, String)]
    os.joinWith(cs, os("ck") === cs("cck"), "inner")
      .map { case (o, c) => (o._1, c._2, o._3.setScale(2).doubleValue) }
      .toDF("o_orderkey", "c_name", "o_total")
      .orderBy("o_orderkey")
  }
}
