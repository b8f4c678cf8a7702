package graft.plans

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Which rank function's `<= k` semantics the operator implements.
  *
  *  - [[TopKTies.RowNum]] — `row_number() <= k`: exactly min(k, n) rows per
  *    group; ties at the boundary resolved arbitrarily (a k-heap).
  *  - [[TopKTies.Rank]] — `rank() <= k`: every row with fewer than k rows
  *    strictly before it — ALL ties at the k boundary are kept, so a group
  *    can emit more than k rows (exactly the rank() contract).
  *  - [[TopKTies.Dense]] — `dense_rank() <= k`: every row among the k
  *    smallest DISTINCT order values; per-value multiplicity is unbounded.
  *
  * The tie modes track order-value EQUIVALENCE CLASSES (a comparator-keyed
  * tree of at most k+1 classes) instead of a row heap: state is O(k +
  * boundary ties) rows for Rank and O(rows of k distinct values) for Dense
  * — both are the size of the operator's own OUTPUT per group, the
  * information-theoretic floor any implementation pays.
  */
sealed abstract class TopKTies extends Serializable
object TopKTies {
  case object RowNum extends TopKTies
  case object Rank extends TopKTies
  case object Dense extends TopKTies
}

/** Whole-operator top-k-per-group as a custom Catalyst plan (builder brief
  * preference (c): LogicalPlan + SparkStrategy + physical SparkPlan).
  *
  * The Window formulation (`row_number over (partition by g order by o)` +
  * `filter rn <= k`) must SORT every group in full before discarding all but
  * k rows. This operator keeps a bounded heap of k rows per group instead:
  *
  *   partial phase (narrow, pre-shuffle): each input partition keeps at most
  *     k rows per group → at 100 TB the shuffle moves k·groups·partitions
  *     rows instead of EVERYTHING;
  *   final phase (after a ClusteredDistribution exchange on the group keys):
  *     merges the partial heaps and emits each group's k rows in order.
  *
  * The partial prune is valid in every [[TopKTies]] mode because a row's
  * per-partition rank is a lower bound on its global rank (its partition's
  * strictly-smaller rows / distinct values are a subset of the global ones)
  * — a row pruned locally can never be kept globally.
  *
  * The planner inserts the exchange automatically because the final exec
  * declares the clustered requirement while the partial declares none.
  * Installed at runtime via `spark.experimental.extraStrategies`.
  */
case class TopKPerGroupNode(groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder], k: Int, ties: TopKTies,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Bounded per-group state for the tie-preserving modes: order-value
  * equivalence classes in a comparator-keyed tree, trimmed from the worst
  * end as soon as the k bound proves a class can never be emitted.
  */
private final class RankClasses(ord: Ordering[InternalRow], k: Int,
    dense: Boolean) {
  private val classes =
    new java.util.TreeMap[InternalRow, mutable.ArrayBuffer[InternalRow]](ord)
  private var total = 0 // rows currently kept (drives the Rank trim rule)

  def insert(row: InternalRow): Unit = {
    if (!classes.isEmpty) {
      // fast reject without copying: the row would open a NEW worst class
      // that the trim rule below would remove immediately
      val c = ord.compare(row, classes.lastKey())
      if (c > 0 && (if (dense) classes.size >= k else total >= k)) return
    }
    val copied = row.copy()
    val existing = classes.get(copied)
    if (existing != null) existing += copied
    else classes.put(copied, mutable.ArrayBuffer(copied))
    total += 1
    // trim worst classes that are now provably beyond the bound:
    //  Rank:  rows strictly before the last class >= k  (its rank > k)
    //  Dense: more than k distinct values
    var go = true
    while (go && classes.size > 1) {
      val last = classes.lastEntry()
      val out =
        if (dense) classes.size > k
        else total - last.getValue.size >= k
      if (out) { total -= last.getValue.size; classes.remove(last.getKey) }
      else go = false
    }
  }

  def emit: Iterator[InternalRow] =
    classes.values().asScala.iterator.flatMap(_.iterator)

  /** Rows currently buffered — the state-size watermark feed. */
  def kept: Int = total
}

case class TopKPerGroupExec(groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder], k: Int, ties: TopKTies, partial: Boolean,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // State-size watermark (round-11 ADVICE item 4): Rank keeps O(k +
  // boundary ties) rows per group, but Dense's per-VALUE multiplicity is
  // unbounded — a skewed top tier buffers every row of that tier in the
  // partial task (the information-theoretic floor for dense_rank <= k
  // semantics: all those rows ARE output). There is no spill path, so the
  // pressure must at least be VISIBLE: the max-merged metric surfaces the
  // largest per-group buffered row count in the SQL UI instead of leaving
  // a pathological tier as silent executor memory growth.
  override lazy val metrics = Map(
    "maxGroupRows" -> GraftBridge.createMaxMetric(sparkContext,
      "max rows buffered for one group"))

  // Global top-k (no group keys) must merge ALL partial heaps in one place;
  // UnspecifiedDistribution here would leave the final merge per-partition
  // and emit up to k rows per partition instead of k total.
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (groupExprs.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(groupExprs))

  // The operator never moves rows between partitions, so the child's
  // partitioning survives. Without this override the UnaryExecNode default
  // (UnknownPartitioning) made EVERY downstream group-keyed consumer —
  // w2/r10's rank re-derivation window — pay a REDUNDANT exchange on the
  // very keys the final phase was already clustered by (round-10 plan
  // audit; TopKPerGroupSpec pins the single-exchange plan).
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val gExprs = groupExprs
    val oExprs = orderExprs
    val limit = k
    val mode = ties
    val maxGroupRows = longMetric("maxGroupRows")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(gExprs, childOutput)
      val ord = new LazilyGeneratedOrdering(oExprs, childOutput)
      mode match {
        case TopKTies.RowNum =>
          // worst-kept-row first, so head is the eviction candidate
          val heapOrd: Ordering[InternalRow] = ord
          val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
          iter.foreach { row =>
            val key = keyProj(row)
            val heap = heaps.getOrElseUpdate(key.copy(),
              mutable.PriorityQueue.empty[InternalRow](heapOrd))
            if (heap.size < limit) heap.enqueue(row.copy())
            else if (ord.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
          }
          if (heaps.nonEmpty)
            maxGroupRows.set(heaps.valuesIterator.map(_.size.toLong).max)
          heaps.iterator.flatMap { case (_, heap) =>
            heap.toArray.sorted(ord.asInstanceOf[Ordering[InternalRow]]).iterator
          }
        case _ =>
          val dense = mode == TopKTies.Dense
          val states = mutable.LinkedHashMap.empty[UnsafeRow, RankClasses]
          iter.foreach { row =>
            val key = keyProj(row)
            states.getOrElseUpdate(key.copy(), new RankClasses(ord, limit, dense))
              .insert(row)
          }
          if (states.nonEmpty)
            maxGroupRows.set(states.valuesIterator.map(_.kept.toLong).max)
          states.iterator.flatMap(_._2.emit)
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, ties, child) =>
      TopKPerGroupExec(g, o, k, ties, partial = false,
        TopKPerGroupExec(g, o, k, ties, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }

  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(this)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ this
    }
}

object TopKPerGroup {

  /** Top-k rows per group. `orderBy` is (columnName, descending); with the
    * default [[TopKTies.RowNum]] the order should be total (add a tie-break
    * column) for deterministic output; [[TopKTies.Rank]]/[[TopKTies.Dense]]
    * keep boundary ties instead (rank()/dense_rank() `<= k` semantics) and
    * are deterministic under any order.
    */
  def apply(df: DataFrame, groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int,
      ties: TopKTies = TopKTies.RowNum): DataFrame = {
    val spark = df.sparkSession
    TopKStrategy.install(spark)
    val child = df.queryExecution.analyzed
    def attr(name: String): Attribute = child.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    val g = groupCols.map(attr(_): Expression)
    val o = orderBy.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    GraftBridge.ofRows(spark, TopKPerGroupNode(g, o, k, ties, child))
  }
}
