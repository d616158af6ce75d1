package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkPlan

/** Plans [[TopKPerKeyNode]] as partial → (exchange inserted by
  * EnsureRequirements from the final's ClusteredDistribution) → final.
  * The partial under the exchange is what makes the shuffle carry at
  * most k rows per key per input partition. */
class TopKStrategy(spark: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rankAttr, child) =>
      TopKPerKeyFinalExec(keys, order, k, rankAttr,
        TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}
