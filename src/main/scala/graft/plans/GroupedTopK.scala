package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator custom plan: top-k rows per key with a rank column —
  * the `row_number() OVER (PARTITION BY … ORDER BY …) <= k` pattern
  * (Q1/Q6 dashboards, per-brand top-k) without WindowExec's full sort.
  *
  * WindowExec must sort every partition by (key, order) — O(n log n)
  * comparisons and a full spill surface — to compute row_number, then a
  * filter throws away all but k rows per key. For small k that work is
  * almost entirely wasted: a bounded per-key heap does it in O(n log k)
  * with O(#keys · k) memory. At 100 TB this is the difference between
  * sorting the fact table and streaming over it.
  *
  * Spark-first architecture note (SURVEY.md §7.3): this is the
  * preference-order (c) case — a logical node + planner strategy +
  * physical exec, registered through `SparkSessionExtensions`
  * ([[graft.GraftExtensions]]), used when composition of built-ins
  * cannot express the efficient plan.
  */
case class GroupedTopK(
    partitionExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rnAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"GroupedTopK: k must be positive, got $k")
  require(partitionExprs.nonEmpty,
    "GroupedTopK: partition keys must be non-empty (global top-k is ORDER BY + LIMIT)")
  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopK =
    copy(child = newChild)
}

/** Physical operator: hash map key → bounded binary heap of row copies.
  * Requires clustering on the partition keys (planner inserts the
  * exchange); emits each key's rows in rank order with the rank
  * appended. No sort of the input ever happens.
  *
  * MEMORY BOUND (documented contract, no spill): the per-task working
  * set is O(#distinct-keys-in-partition × k) row copies in an unmanaged
  * hash map — unlike WindowExec, which sorts but can spill. With the
  * clustered exchange hashing keys across `spark.sql.shuffle.partitions`
  * tasks, the bound per task is ≈ |keys| / shufflePartitions × k rows.
  * That is the operator's intended regime (dashboard/top-k queries:
  * few-to-millions of keys, small k). For |keys| × k × rowWidth
  * approaching executor memory, size up shuffle partitions (the bound
  * shrinks linearly) or fall back to the row_number window form, which
  * WindowExec spills — the [[graft.plans.RowNumberTopKRewrite]] rule can
  * be disabled per-query via spark.sql.optimizer.excludedRules. */
case class GroupedTopKExec(
    partitionExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rnAttr: Attribute,
    child: SparkPlan,
    partial: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rnAttr
  override def producedAttributes: AttributeSet =
    if (partial) AttributeSet.empty else AttributeSet(rnAttr)
  // The partial stage runs MAP-SIDE before the exchange (any distribution),
  // pruning each input partition to its local top-k per key — a row
  // outside a local top-k cannot be in the global top-k, so only
  // O(#local-keys × k) rows ever reach the shuffle (the same trick as
  // Spark's WindowGroupLimit Partial). The final stage requires
  // clustering and assigns ranks.
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(partitionExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val partExprs = partitionExprs
    val order = orderSpec
    val limit = k
    val isPartial = partial
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val rowOrdering: Ordering[InternalRow] =
        GenerateOrdering.generate(
          BindReferences.bindReferences(order, childOutput))
      // Scala PriorityQueue is a MAX-heap on its ordering, so with the
      // row ordering itself the root is the WORST of the current top-k
      // (last in the desired sequence), evicted when a better row comes
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        // child rows are usually UnsafeRow (post-exchange), but when the
        // input is already clustered no exchange is inserted and an
        // interpreted child may emit JoinedRow etc — InternalRow is the
        // honest contract (copy() below handles either).
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](
            rowOrdering)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) {
          heap.enqueue(row.copy())
        } else if (rowOrdering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      if (isPartial) {
        // map-side prune: emit surviving rows as-is (ranks are assigned
        // by the final stage after the exchange)
        val entries = heaps.values().iterator()
        new Iterator[InternalRow] {
          private var current: Iterator[InternalRow] = Iterator.empty
          override def hasNext: Boolean = {
            while (!current.hasNext && entries.hasNext) {
              current = entries.next().iterator
            }
            current.hasNext
          }
          override def next(): InternalRow = current.next()
        }
      } else {
        val outProj = UnsafeProjection.create(childOutput :+ rnAttr,
          childOutput :+ rnAttr)
        val rnRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        val joined = new JoinedRow
        val entries = heaps.values().iterator()
        new Iterator[InternalRow] {
          private var current: Iterator[InternalRow] = Iterator.empty
          override def hasNext: Boolean = {
            while (!current.hasNext && entries.hasNext) {
              val ranked = entries.next().dequeueAll.reverse // ascending order
              current = ranked.iterator.zipWithIndex.map { case (r, i) =>
                rnRow.update(0, i + 1)
                outProj(joined(r, rnRow))
              }
            }
            current.hasNext
          }
          override def next(): InternalRow = current.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}

/** Planner strategy: lower the logical node to its exec. Registered via
  * `injectPlannerStrategy` in [[graft.GraftExtensions]]. */
object GraftStrategies extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopK(part, order, k, rn, child) =>
      // two-stage: map-side partial prune (bounds the shuffle to
      // O(local-keys × k) rows) under the rank-assigning final stage;
      // EnsureRequirements inserts the exchange between them
      GroupedTopKExec(part, order, k, rn,
        GroupedTopKExec(part, order, k, rn, planLater(child), partial = true),
        partial = false) :: Nil
    case _ => Nil
  }
}
