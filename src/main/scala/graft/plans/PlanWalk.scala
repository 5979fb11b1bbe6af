package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Executed-plan traversal shared by the bench shuffle metric and the
  * plan-pin tests, so the AQE-unwrapping rules cannot diverge between
  * them. Unwraps adaptive wrappers, query stages, and subquery plans
  * (which are NOT in `children`); an `InMemoryTableScan` stays a leaf —
  * a node absent from the flattened tree is proven to execute only
  * inside a cached relation.
  *
  * @param intoReusedExchange descend into a reused exchange's child
  *        (the original exchange). Pass false when summing per-node
  *        metrics: the reused node SHARES the original's accumulators,
  *        so visiting both double-counts.
  */
object PlanWalk {
  def flatten(p: SparkPlan, intoReusedExchange: Boolean = true): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => if (intoReusedExchange) Seq(r.child) else Nil
      case other => other.children
    }
    p +: (kids ++ p.subqueries).flatMap(flatten(_, intoReusedExchange))
  }
}
