package graft.exec

import graft.plans.BandJoinPattern
import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, JoinedRow, Predicate, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical band join: the (c)-tier custom operator of SURVEY.md §7.3
  * — Spark has no band-join strategy, so a plain
  * `x BETWEEN y - w1 AND y + w2` plans as a nested-loop cross product.
  * This operator executes it as a single bucketed shuffle:
  *
  *  - LEFT rows shuffle once to bucket(x), with W = w1 + w2;
  *  - RIGHT rows replicate to the (≤ 2, sometimes 3) consecutive
  *    buckets their band can touch — bounded fan-out, unlike the
  *    unbounded broadcast of a nested-loop plan;
  *  - each bucket joins its co-grouped rows, re-checking the FULL
  *    original condition per pair, so the output is exactly the
  *    BETWEEN-join output at one-shuffle cost.
  *
  * A pair can only meet in bucket(x) (the left row lives in exactly
  * one bucket, the right row's replicas are distinct buckets), so no
  * dedup is needed. Bucket arithmetic is exact-LONG for integral
  * operands and IEEE floor-division otherwise, shared with the
  * rewrite-rule path via [[BandJoinPattern]]. Null band operands emit
  * nothing (inner-join semantics). Per-bucket pairing is a nested loop
  * over co-grouped rows — at most the rows of one W-wide band slice,
  * the same working set the rewritten hash-join path touches.
  */
final case class BandJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    x: Expression,
    y: Expression,
    w1: Double,
    w2: Double,
    cond: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BandJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val w = w1 + w2
    val integral = BandJoinPattern.integralOperands(x, y, w1, w2)
    val leftOut = left.output
    val rightOut = right.output
    val lBucket = BandJoinPattern.div(x, w, integral)
    val rLo = BandJoinPattern.div(
      BandJoinPattern.shift(y, w1, -1, integral), w, integral)
    val rHi = BandJoinPattern.div(
      BandJoinPattern.shift(y, w2, 1, integral), w, integral)
    val condExpr = cond
    val numParts = conf.numShufflePartitions

    val lKeyed: RDD[(Long, UnsafeRow)] = left.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(Seq(lBucket), leftOut)
      val toUnsafe = UnsafeProjection.create(leftOut.map(_.dataType).toArray)
      it.flatMap { row =>
        val k = keyProj(row)
        if (k.isNullAt(0)) Iterator.empty
        else Iterator.single((k.getLong(0), toUnsafe(row).copy()))
      }
    }
    val rKeyed: RDD[(Long, UnsafeRow)] = right.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(Seq(rLo, rHi), rightOut)
      val toUnsafe = UnsafeProjection.create(rightOut.map(_.dataType).toArray)
      it.flatMap { row =>
        val k = keyProj(row)
        if (k.isNullAt(0) || k.isNullAt(1)) Iterator.empty
        else {
          val u = toUnsafe(row).copy()
          (k.getLong(0) to k.getLong(1)).iterator.map(b => (b, u))
        }
      }
    }

    lKeyed.cogroup(rKeyed, new HashPartitioner(numParts)).mapPartitions { it =>
      val joined = new JoinedRow
      val pred = Predicate.create(condExpr, leftOut ++ rightOut)
      // downstream operators expect UnsafeRow (reused-buffer contract)
      val outProj = UnsafeProjection.create(leftOut ++ rightOut, leftOut ++ rightOut)
      it.flatMap { case (_, (ls, rs)) =>
        if (ls.isEmpty || rs.isEmpty) Iterator.empty
        else for {
          l <- ls.iterator
          r <- rs.iterator
          if pred.eval(joined(l, r))
        } yield outProj(joined): InternalRow
      }
    }
  }
}
