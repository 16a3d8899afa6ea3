package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Component-wise sum of fixed-width `array<bigint>` vectors with a
  * CONSTANT `dim`-long aggregation buffer — the scale-safe centroid
  * trainer. Unlike `collect_list(...)` + fold (whose single buffer row
  * grows with group cardinality: millions of vectors per IVF cell at
  * corpus scale → executor OOM), this state is `dim * 8` bytes no
  * matter how many vectors a cell holds, and Spark runs it as a
  * partial aggregate: each map task pre-reduces its partition to one
  * buffer per group before the shuffle.
  *
  * Integer addition is associative and commutative, so the result is
  * independent of row order, partitioning, and partial/final merge
  * schedule — callers that integer-scale double vectors first
  * (`floor(v * 1e9)`) get bit-exact, cross-engine-reproducible
  * centroids WITHOUT the sorted sequential fold the FP formulation
  * needed. Overflow headroom: unit-scale components sum ~1e9 per row,
  * so a cell can hold ~9e9 rows before approaching 2^63.
  *
  * Null arrays are skipped (contribute nothing); null ELEMENTS are not
  * supported (engine contract: embedding arrays are dense). Inputs
  * shorter than `dim` contribute only their defined prefix.
  */
final case class LongVecSumAgg(
    child: Expression,
    dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(dim > 0, s"vector width must be positive, got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lvsum requires an array<bigint> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = s"graft_lvsum_$dim"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      val n = math.min(dim, a.numElements())
      var i = 0
      while (i < n) { buf(i) += a.getLong(i); i += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * dim)
    var i = 0
    while (i < dim) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](dim)
    var i = 0
    while (i < dim) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongVecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongVecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): LongVecSumAgg =
    copy(child = newChild)
}
