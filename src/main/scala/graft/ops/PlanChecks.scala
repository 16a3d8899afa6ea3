package graft.ops

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Executed-plan lint helpers shared by in-entry asserts and specs —
  * one walker, so an AQE wrapper change is fixed in one place instead
  * of silently diverging across hand-kept copies. */
object PlanChecks {

  /** ShuffleExchange count, descending through AQE wrappers
    * (AdaptiveSparkPlanExec / QueryStageExec hide their physical plan
    * from TreeNode traversal; ShuffleExchangeExec's own subtree is
    * walked by collect itself — adding recursion there would double
    * count). */
  def countShuffles(p: SparkPlan): Int = p.collect {
    case a: AdaptiveSparkPlanExec => countShuffles(a.executedPlan)
    case q: QueryStageExec => countShuffles(q.plan)
    case _: ShuffleExchangeExec => 1
  }.sum
}
