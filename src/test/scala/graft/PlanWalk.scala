package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Full operator-tree walk for plan pins. Under AQE the root is an
  * AdaptiveSparkPlanExec, which is a LeafExecNode — a naive
  * plan.collect sees NOTHING inside it (a sweep written that way is
  * vacuously green; round-3 review finding). Descend through the
  * adaptive wrapper, materialized query stages, reused exchanges, and
  * plan-level subqueries. ONE definition — a new AQE wrapper node type
  * gets handled here once, not in each spec's private copy. */
object PlanWalk {
  def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case r: ReusedExchangeExec    => Seq(r.child) // leaf aliasing the original
      case _                        => Nil
    }
    p +: (p.children ++ inner ++ p.subqueries).flatMap(allNodes)
  }
}
