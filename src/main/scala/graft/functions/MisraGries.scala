package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items state: at most k counters over an
  * unbounded key domain. The completeness dual of [[CountMinAgg]]'s
  * point estimates — CountMin answers "how often did THIS key occur",
  * Misra-Gries answers "WHICH keys occurred often" without knowing
  * them in advance, in O(k) state per partial aggregate.
  *
  * Update is the classic decrement-all step: an unseen key arriving at
  * a full summary decrements every counter (amortized O(1) — each
  * decrement event pays for one prior increment). Merge is the
  * mergeable-summaries rule (Agarwal et al., PODS'12): add counters
  * keywise, then subtract the (k+1)-th largest count from all and drop
  * the non-positive. Under ANY merge tree this keeps the deterministic
  * contract the catalog entry oracles:
  *
  *   est(x) <= true(x) <= est(x) + n/(k+1)      (est(x) = 0 if absent)
  *
  * so every key with true(x) > n/(k+1) is necessarily retained. Merge
  * order shifts WHICH borderline keys survive and their estimates —
  * like KLL, the sketch is driver-hashable only through contract
  * flags, never raw estimates.
  */
final class MgState(val k: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def insert(key: String): Unit = {
    counts.get(key) match {
      case Some(c) => counts.update(key, c + 1)
      case None if counts.size < k => counts.update(key, 1L)
      case None =>
        // decrement-all; the incoming item is absorbed by the decrement
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace((_, c) => c - 1)
        counts.foreach { case (kk, c) => if (c <= 0) dead += kk }
        dead.foreach(counts.remove)
    }
  }

  def mergeIn(other: MgState): Unit = {
    other.counts.foreach { case (kk, c) =>
      counts.update(kk, counts.getOrElse(kk, 0L) + c)
    }
    if (counts.size > k) {
      // subtract the (k+1)-th largest count from all, drop <= 0
      val sorted = counts.values.toArray
      java.util.Arrays.sort(sorted)
      val cut = sorted(sorted.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, c) => c - cut)
      counts.foreach { case (kk, c) => if (c <= 0) dead += kk }
      dead.foreach(counts.remove)
    }
  }
}

/** Misra-Gries frequent-items aggregate over a STRING column: returns
  * a struct of parallel arrays (key: array<string>, cnt: array<bigint>)
  * sorted by key (see [[MgState]] for the error contract).
  */
final case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgState]
  with UnaryLike[Expression] {

  require(k >= 2, s"misra-gries capacity must be >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_mg requires a STRING input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("key", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("cnt", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = s"graft_mg_$k"

  override def createAggregationBuffer(): MgState = new MgState(k)

  override def update(buf: MgState, input: InternalRow): MgState = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MgState, other: MgState): MgState = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: MgState): Any = {
    val entries = buf.counts.toArray.sortBy(_._1)
    new GenericInternalRow(Array[Any](
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1))),
      new GenericArrayData(entries.map(_._2))))
  }

  override def serialize(buf: MgState): Array[Byte] = {
    var bytes = 4
    val enc = buf.counts.toArray.map { case (kk, c) =>
      val b = kk.getBytes(StandardCharsets.UTF_8)
      bytes += 4 + b.length + 8
      (b, c)
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(enc.length)
    enc.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgState = {
    val buf = new MgState(k)
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      buf.counts.update(new String(b, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}
