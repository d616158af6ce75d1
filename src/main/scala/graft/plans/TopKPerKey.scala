package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, SortOrder, UnsafeProjection, UnsafeRow}
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

  /** Retains at most k rows per key from `iter`; returns (key, sorted
    * rows best-first). The heap keeps the WORST retained row on top so
    * a better candidate can evict it in O(log k). */
  def topKByKey(
      iter: Iterator[InternalRow],
      keyProj: UnsafeProjection,
      rowProj: UnsafeProjection,
      ordering: Ordering[InternalRow],
      k: Int): Iterator[(UnsafeRow, Array[UnsafeRow])] = {
    val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
    val reverse = ordering.reverse.asInstanceOf[Ordering[UnsafeRow]]
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[UnsafeRow](k, reverse)
        heaps.put(key.copy(), heap)
      }
      if (heap.size < k) {
        heap.add(rowProj(row).copy())
      } else if (ordering.lt(row, heap.peek())) {
        heap.poll()
        heap.add(rowProj(row).copy())
      }
    }
    import scala.jdk.CollectionConverters._
    heaps.entrySet().iterator().asScala.map { e =>
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
      TopKHeaps.topKByKey(iter, keyProj, rowProj, ord, kLocal)
        .flatMap(_._2.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

/** Reduce-side final: requires clustering on the keys, merges the
  * partial survivors and appends rank (1..k, in `order`). */
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

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keysLocal = keys
    val orderLocal = order
    val childOutput = child.output
    val outputLocal = output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val ord = new LazilyGeneratedOrdering(orderLocal, childOutput)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      // downstream operators (exchanges, writers) expect UnsafeRow
      val outProj = UnsafeProjection.create(outputLocal.map(_.dataType).toArray)
      TopKHeaps.topKByKey(iter, keyProj, rowProj, ord, kLocal).flatMap {
        case (_, rows) =>
          rows.iterator.zipWithIndex.map { case (r, i) =>
            outProj(joined(r, InternalRow((i + 1).toLong))): InternalRow
          }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyFinalExec =
    copy(child = newChild)
}
