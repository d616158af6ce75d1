package graft.rules

import graft.plans.TopKPerKeyNode
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the canonical top-k-per-key pattern
  *
  * {{{ Filter(rn <= k, Window([row_number() as rn] par keys ord o)) }}}
  *
  * into [[TopKPerKeyNode]], which plans as a partial/final bounded-heap
  * pair instead of a full per-partition sort of every row (see the node
  * doc for why that matters at scale). Injected via
  * [[graft.GraftExtensions]]; users keep writing the standard window
  * idiom and get the efficient plan.
  *
  * Only fires when the Window computes EXACTLY ONE window function and
  * it is a row_number over a non-empty partition spec — rank()/
  * dense_rank() admit ties beyond k and other functions need the full
  * frame, and an empty partition spec is global top-k, which Spark
  * already plans as TakeOrderedAndProject.
  */
object WindowRankToTopK extends Rule[LogicalPlan] {

  /** rn <= k / rn < k / k >= rn / k > rn on a literal int k → k. */
  private def rankBound(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, _)) if a.exprId == rn => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, _)) if a.exprId == rn => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, _), a: AttributeReference) if a.exprId == rn => Some(k)
    case GreaterThan(Literal(k: Int, _), a: AttributeReference) if a.exprId == rn => Some(k - 1)
    case EqualTo(a: AttributeReference, Literal(1, _)) if a.exprId == rn => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(partitionSpec, orderSpec, _)), _)), _, _, child, _))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      val rnAttr = f.child.output.last // the Window appends its one expression
      rankBound(cond, rnAttr.exprId) match {
        case Some(k) if k > 0 =>
          val rank = AttributeReference(rnAttr.name, rnAttr.dataType, nullable = false)()
          val node = TopKPerKeyNode(partitionSpec, orderSpec, k,
            TopKPerKeyNode.rankAttribute(), child)
          // window's row_number is IntegerType; our rank is LongType —
          // project it back to the original attribute id and type so
          // everything above the Filter still resolves.
          org.apache.spark.sql.catalyst.plans.logical.Project(
            child.output :+ Alias(Cast(node.output.last, rnAttr.dataType), rnAttr.name)(
              exprId = rnAttr.exprId),
            node)
        case _ => f
      }
  }
}
