package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.truncatedString
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Whole-operator custom plan (SURVEY.md §3 / brief option (c)):
  * top-k rows per key.
  *
  * The built-in formulation — `row_number() OVER (PARTITION BY keys
  * ORDER BY o) <= k` — SORTS every key's entire partition before
  * discarding all but k rows, and ships every input row through the
  * shuffle. This operator keeps a k-bounded heap per key instead:
  *
  *   Partial (map side, no distribution requirement): each input
  *   partition retains at most k rows per key — the shuffle then carries
  *   ≤ k·keys·partitions rows instead of ALL rows. This is the MR
  *   combiner idea applied to ranking.
  *
  *   Final (requires clustering on keys): merges the survivors, emits
  *   each key's rows in order with a `rank` column (1..k).
  *
  * At 100 TB with millions of rows per hot key and k=5, the window
  * formulation sorts and shuffles everything; this shuffles ~nothing.
  * The [[graft.rules.WindowRankToTopK]] optimizer rule rewrites the
  * window pattern into this node automatically.
  */
final case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override def maxRows: Option[Long] = child.maxRows

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)

  override def simpleString(maxFields: Int): String =
    s"TopKPerKey k=$k, keys=${truncatedString(keys, "[", ", ", "]", maxFields)}, " +
      s"order=${truncatedString(order, "[", ", ", "]", maxFields)}"
}

object TopKPerKeyNode {
  def rankAttribute(): AttributeReference = AttributeReference("rank", LongType, nullable = false)()
}

/** Shared per-partition top-k pass: key projection + bounded heaps. */
private[plans] object TopKHeaps {

  /** Heap-map key budget per partition: memory is O(k · live keys), so a
    * near-unique grouping key can no longer pin an entire partition
    * on-heap — the map flushes (emits current heaps, restarts) at this
    * many keys. Flushing preserves correctness for the PARTIAL stage:
    * the emitted stream is a superset of each key's per-partition top-k,
    * and the final merge reduces it (a row evicted pre-flush lost to k
    * better rows that WERE emitted at the flush). */
  val FlushKeys: Int = 1 << 15

  /** Retains at most k rows per key from `iter` per flush window;
    * returns (key, sorted rows best-first) lazily. The heap keeps the
    * WORST retained row on top so a better candidate can evict it in
    * O(log k). A key that spans a flush boundary is emitted once per
    * window (downstream merges). */
  def topKByKey(
      iter: Iterator[InternalRow],
      keyProj: UnsafeProjection,
      rowProj: UnsafeProjection,
      ordering: Ordering[InternalRow],
      k: Int,
      maxKeys: Int = Int.MaxValue): Iterator[(UnsafeRow, Array[UnsafeRow])] =
    new Iterator[(UnsafeRow, Array[UnsafeRow])] {
      private val reverse = ordering.reverse.asInstanceOf[Ordering[UnsafeRow]]
      private var drain: java.util.Iterator[
        java.util.Map.Entry[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]] =
        java.util.Collections.emptyIterator()

      private def fill(): Unit = {
        if (drain.hasNext || !iter.hasNext) return
        val heaps =
          new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
        var full = false
        while (iter.hasNext && !full) {
          val row = iter.next()
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[UnsafeRow](k.min(16), reverse)
            heaps.put(key.copy(), heap)
            full = heaps.size() >= maxKeys
          }
          if (heap.size < k) {
            heap.add(rowProj(row).copy())
          } else if (ordering.lt(row, heap.peek())) {
            heap.poll()
            heap.add(rowProj(row).copy())
          }
        }
        drain = heaps.entrySet().iterator()
      }

      override def hasNext: Boolean = { fill(); drain.hasNext }

      override def next(): (UnsafeRow, Array[UnsafeRow]) = {
        fill()
        val e = drain.next()
        val arr = e.getValue.toArray(new Array[UnsafeRow](e.getValue.size))
        java.util.Arrays.sort(arr, ordering.asInstanceOf[Ordering[UnsafeRow]])
        (e.getKey, arr)
      }
    }
}

/** Map-side partial: emits ≤ k rows per key per input partition.
  * Output schema unchanged (no rank yet — ranks are only correct after
  * the final merge). */
final case class TopKPerKeyPartialExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] = Seq(UnspecifiedDistribution)

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keysLocal = keys
    val orderLocal = order
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val ord = new LazilyGeneratedOrdering(orderLocal, childOutput)
      TopKHeaps.topKByKey(iter, keyProj, rowProj, ord, kLocal, TopKHeaps.FlushKeys)
        .flatMap(_._2.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

/** Reduce-side final: requires clustering AND (key, order) sorting, then
  * streams each key's run, emitting the first k rows with rank (1..k).
  *
  * Sort-merge instead of a heap map: state is O(k) regardless of key
  * cardinality — a near-unique grouping key spills in the sort Spark
  * inserts to satisfy [[requiredChildOrdering]] (external, disk-backed),
  * never in this operator. The sort's input is only the partial
  * survivors (≤ k · keys · map-partitions rows), a small fraction of
  * what the window formulation would have sorted. */
final case class TopKPerKeyFinalExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(keys))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(keys.map(SortOrder(_, Ascending)) ++ order)

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keysLocal = keys
    val childOutput = child.output
    val outputLocal = output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      // downstream operators (exchanges, writers) expect UnsafeRow
      val outProj = UnsafeProjection.create(outputLocal.map(_.dataType).toArray)
      var curKey: UnsafeRow = null
      var rank = 0L
      iter.flatMap { row =>
        val key = keyProj(row)
        if (curKey == null || key != curKey) {
          curKey = key.copy()
          rank = 0L
        }
        rank += 1
        if (rank <= kLocal) {
          Iterator.single(outProj(joined(row, InternalRow(rank))): InternalRow)
        } else Iterator.empty
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyFinalExec =
    copy(child = newChild)
}
