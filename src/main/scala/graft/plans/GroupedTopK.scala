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
  * MEMORY: per-key state is a bounded buffer of ≤ k rows held in
  * Spark's spillable combiner map ([[org.apache.spark.GraftSpillGlue]]
  * → ExternalAppendOnlyMap): memory is acquired through the
  * TaskMemoryManager and high key cardinality (e.g. as-of joins keyed
  * by event id) degrades to sorted spill files merged on iteration —
  * not an executor OOM. The working set that stays resident is
  * O(in-memory-keys × k) row copies; sizing up shuffle partitions still
  * shrinks the per-task key count linearly. */
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
      // Per-key combiner: ascending-sorted bounded buffer (binary-search
      // insert; k is small by contract). Plain data rows only — no
      // codegen'd ordering inside — so the map can serialize combiners
      // when it spills.
      def insertBounded(buf: scala.collection.mutable.ArrayBuffer[InternalRow],
          row: InternalRow): scala.collection.mutable.ArrayBuffer[InternalRow] = {
        if (buf.length == limit && rowOrdering.compare(row, buf.last) >= 0) buf
        else {
          var lo = 0
          var hi = buf.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (rowOrdering.compare(buf(mid), row) <= 0) lo = mid + 1 else hi = mid
          }
          buf.insert(lo, row)
          if (buf.length > limit) buf.remove(limit)
          buf
        }
      }
      // Spark's spillable combiner map (the combineByKey structure):
      // memory accounted via TaskMemoryManager, spills to sorted files
      // and merges on iteration — high key cardinality (e.g. as-of joins
      // keyed by event id) degrades to disk instead of OOM.
      val map = org.apache.spark.GraftSpillGlue
        .externalMap[UnsafeRow, InternalRow,
          scala.collection.mutable.ArrayBuffer[InternalRow]](
          v => {
            val b = new scala.collection.mutable.ArrayBuffer[InternalRow](
              math.min(limit, 16))
            b += v
            b
          },
          (b, v) => insertBounded(b, v),
          (b1, b2) => { b2.foreach(r => insertBounded(b1, r)); b1 })
      // Project every row to UnsafeRow before insert: the spill path
      // Java-serializes the buffered combiners, and UnsafeRow is always
      // self-contained, while an interpreted child (no exchange below
      // the partial stage) may emit GenericInternalRow holding
      // UnsafeArrayData/UnsafeMapData fields whose serialization would
      // fail — and only under memory pressure, during a spill.
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      map.insertAll(iter.map(r => (keyProj(r).copy(), rowProj(r).copy())))
      if (isPartial) {
        // map-side prune: emit surviving rows as-is (ranks are assigned
        // by the final stage after the exchange)
        map.iterator.flatMap(_._2)
      } else {
        val outProj = UnsafeProjection.create(childOutput :+ rnAttr,
          childOutput :+ rnAttr)
        val rnRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        val joined = new JoinedRow
        map.iterator.flatMap { case (_, buf) =>
          buf.iterator.zipWithIndex.map { case (r, i) =>
            rnRow.update(0, i + 1)
            outProj(joined(r, rnRow))
          }
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
