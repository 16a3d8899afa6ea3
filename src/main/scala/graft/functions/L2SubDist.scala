package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Squared L2 distance over one length-`len` subspace of two
  * array<double> vectors: sum over i in [start, start+len) of
  * (a[i] - b[i])², accumulated sequentially in index order from 0.0 —
  * bit-identical to the interpreted
  * `aggregate(zip_with(slice(a,..), slice(b,..), sq), 0.0, +)`
  * formulation and to the DuckDB list_reduce twin, but one tight
  * codegen loop with no per-row slice/zip allocations. This is the
  * product-quantization hot path: |vectors| × |subspaces| × |codes|
  * rows each evaluate one call, so the interpreted HOF chain dominates
  * the whole PQ pipeline without it.
  *
  * `start` is 0-based. Rows where the window [start, start+len) falls
  * outside either array yield null (callers treat that as a bug, but a
  * silent wrong sum would be worse).
  */
final case class L2SubDist(
    first: Expression, second: Expression, third: Expression, len: Int)
  extends TernaryExpression {

  require(len > 0, s"subspace length must be positive, got $len")

  override def checkInputDataTypes(): TypeCheckResult = {
    val arraysOk = Seq(first, second).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (arraysOk && third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_l2sub requires (array<double>, array<double>, int), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = s"graft_l2sub_$len"

  override def nullSafeEval(a: Any, b: Any, s: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val start = s.asInstanceOf[Int]
    if (start < 0 || start + len > x.numElements() ||
      start + len > y.numElements()) null
    else {
      var acc = 0.0
      var i = start
      val end = start + len
      while (i < end) {
        val d = x.getDouble(i) - y.getDouble(i)
        acc += d * d
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, s) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val dd = ctx.freshName("dd")
      s"""
         |if ($s < 0 || $s + $len > $a.numElements() || $s + $len > $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = $s; $i < $s + $len; $i++) {
         |    double $dd = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $dd * $dd;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): L2SubDist =
    copy(first = newFirst, second = newSecond, third = newThird)
}
