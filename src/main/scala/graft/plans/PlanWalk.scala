package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Physical-plan traversal that DESCENDS through AQE wrappers. On Spark 4
  * AQE is on by default and `executedPlan` is an `AdaptiveSparkPlanExec`
  * LEAF — a bare `plan.collect` stops there and matches nothing (the
  * round-5 vacuous-guard lesson). Shared by the test-side plan guards
  * (TestSpark) and the shipped plan-digest audit ([[graft.Plans.digest]]).
  */
object PlanWalk {
  def collectDeep[T](plan: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = if (pf.isDefinedAt(plan)) Seq(pf(plan)) else Nil
    val kids = plan match {
      case a: AdaptiveSparkPlanExec => Seq(a.initialPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case other                    => other.children
    }
    here ++ kids.flatMap(collectDeep(_)(pf))
  }
}
