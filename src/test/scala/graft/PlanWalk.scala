package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Flattens an EXECUTED plan into all of its nodes, descending through
  * AQE wrappers and subqueries — QueryStageExec is a LeafExecNode, so
  * a plain TreeNode.collect never sees inside materialized stages.
  */
object PlanWalk {
  def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: nodes(a.executedPlan)
    case q: QueryStageExec => p +: nodes(q.plan)
    case other => other +: (other.children ++ other.subqueries).flatMap(nodes)
  }
}
