package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

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
  * The planner inserts the exchange automatically because the final exec
  * declares the clustered requirement while the partial declares none.
  * Installed at runtime via `spark.experimental.extraStrategies`.
  */
case class TopKPerGroupNode(groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder], k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

case class TopKPerGroupExec(groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder], k: Int, partial: Boolean, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

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
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(gExprs, childOutput)
      val ord = new LazilyGeneratedOrdering(oExprs, childOutput)
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
      heaps.iterator.flatMap { case (_, heap) =>
        heap.toArray.sorted(ord.asInstanceOf[Ordering[InternalRow]]).iterator
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }

  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(this)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ this
    }
}

object TopKPerGroup {

  /** Top-k rows per group. `orderBy` is (columnName, descending); the order
    * should be total (add a tie-break column) for deterministic output.
    */
  def apply(df: DataFrame, groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
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
    GraftBridge.ofRows(spark, TopKPerGroupNode(g, o, k, child))
  }
}
