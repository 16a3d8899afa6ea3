package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-minimum-values (theta) sketch aggregate: keeps the `k` smallest
  * DISTINCT values of a long hash column per group, in O(k) memory
  * regardless of group cardinality — the bounded-state alternative to
  * `collect_set` for distinct estimation at corpus scale.
  *
  * The result (ascending array of at most k longs) is a deterministic
  * function of the input SET: insertion order, partitioning, and
  * partial/final merge order cannot change which k values are smallest.
  * That makes every downstream estimate exactly reproducible by a SQL
  * oracle (`row_number() OVER (ORDER BY h) <= k`), unlike
  * approx_count_distinct's implementation-defined HLL++.
  *
  * Estimates (computed by the caller from the sketch):
  *  - distinct:  |S| < k → exact |S|; else (k-1) * 2^32 / h_k for
  *    uniform 32-bit hashes (h_k = the k-th smallest = theta).
  *  - set ops: with theta = min(theta_A, theta_B), every retained hash
  *    < theta is a uniform sample of the union at rate theta/2^32, so
  *    union/intersection counts below theta scale by 2^32/theta.
  *
  * The reference has no sketching surface (SURVEY.md §2.4 extension);
  * this is the (b)-tier custom-Catalyst path of SURVEY.md §7.3 — an
  * aggregate Spark lacks (its theta-sketch SQL functions are
  * non-deterministic across merges and not cross-engine reproducible).
  *
  * State is a sorted TreeSet capped at k: update is O(log k) with an
  * early reject (v >= last) for the common case once the sketch is
  * full; serialization is the raw 8-byte longs.
  */
final case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"kmv sketch size must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv requires a BIGINT input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = s"graft_kmv_$k"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    var continue = true
    while (continue && it.hasNext) {
      // `other` iterates ascending; once one value is rejected for
      // being >= the full buffer's max, all later ones are too
      continue = add(buf, it.next())
    }
    buf
  }

  /** @return false iff v was rejected because the sketch is full and
    *         v >= its max (so any larger value would be rejected too) */
  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Boolean =
    if (buf.size() < k) { buf.add(v); true }
    else if (v < buf.last()) {
      if (buf.add(v)) buf.pollLast()
      true
    } else v == buf.last() // equal → dedup'd no-op, but keep scanning

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = new java.util.TreeSet[java.lang.Long]()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}
