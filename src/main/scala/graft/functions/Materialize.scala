package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity pass-through that the optimizer must not look through.
  *
  * Marked non-deterministic (it is in fact pure — the flag is a fence,
  * not a semantic claim) so that `CollapseProject` will not inline the
  * aliased child into consumers and `PushDownPredicates` will not push
  * a filter through the projection that contains it. The fence exists
  * for one failure mode: a filter pushed through a projection
  * SUBSTITUTES aliases with their defining expressions, and inside
  * higher-order-function lambdas there is no common-subexpression
  * elimination — e.g. a pushed-down quality gate re-evaluates
  * `split(text)` inside every `element_at` of every shingle lambda,
  * turning an O(n) battery into O(k·n) splits per document (measured
  * ~10× on the corpus e2e heads). Wrapping the token array in
  * Materialize keeps the filter ABOVE the projection, so the array is
  * computed once per row and every consumer reads the attribute.
  *
  * Codegen-transparent: compiles to the child's code, zero runtime
  * cost. The trade: predicates never push past it to the scan, so wrap
  * only columns whose consumers would otherwise re-compute them. */
case class Materialize(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  // UnaryExpression delegates foldable to the child — a foldable child
  // would let ConstantFolding / EliminateWindowPartitions look through
  // the fence (BoundedWindow partitions by Materialize(0) precisely so
  // the constant key survives optimization)
  override def foldable: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(newChild: Expression): Materialize =
    copy(child = newChild)
}
