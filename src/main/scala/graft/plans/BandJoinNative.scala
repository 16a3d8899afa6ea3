package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Logical band join: `L JOIN R ON x BETWEEN y - w1 AND y + w2`
  * (inner), recognized from a plain Join by [[BandJoinConvert]] and
  * planned by [[BandJoinStrategy]] into [[graft.exec.BandJoinExec]].
  * `cond` keeps the FULL original join condition (band conjuncts plus
  * any extras) — the physical operator re-checks it per candidate
  * pair, so the conversion is exact by construction. */
final case class BandJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    x: Expression,
    y: Expression,
    w1: Double,
    w2: Double,
    cond: Expression) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BandJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule (the native-path twin of [[BandJoinRewrite]], active
  * only under `spark.graft.bandjoin.native=true`): swap a recognized
  * inner band join for [[BandJoinPlan]] so the planner can pick the
  * dedicated physical operator instead of a rewritten Generate +
  * hash-join tree. Runs in the user-provided batch, i.e. after the
  * main optimization of the children. */
object BandJoinConvert extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString("spark.graft.bandjoin.native", "false") != "true") plan
    else plan.transform {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        BandJoinPattern.findBand(cond, left, right) match {
          case Some((x, y, w1, w2)) if w1 + w2 > 0 =>
            BandJoinPlan(left, right, x, y, w1, w2, cond)
          case _ => j
        }
    }
}

/** Plans [[BandJoinPlan]] → [[graft.exec.BandJoinExec]]. */
object BandJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BandJoinPlan(l, r, x, y, w1, w2, cond) =>
      graft.exec.BandJoinExec(planLater(l), planLater(r), x, y, w1, w2, cond) :: Nil
    case _ => Nil
  }
}
