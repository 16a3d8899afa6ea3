package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable KLL-style quantile sketch state: a hierarchy of level
  * buffers where an item at level h carries rank weight 2^h. Level 0
  * receives raw updates; a full level is sorted and COMPACTED — half
  * its items (alternating odd/even sorted positions, tracked by a
  * per-level toggle so the one-sided rank bias of a fixed choice
  * cancels across compactions) are promoted with doubled weight to the
  * level above, the rest are discarded. Total retained state is
  * O(k · log(n/k)) regardless of group size — the bounded-state
  * alternative to the full sort an exact percentile needs, which is
  * the operation that matters at 100 TB (exact distributed percentile
  * costs a global sort or a sharded cumulative sum; the sketch costs
  * one pass + kilobytes per group, and partial sketches merge).
  *
  * Everything here is deterministic (no RNG — the toggle replaces
  * KLL's coin flip), so the rank-error contract below is a worst-case
  * guarantee, not a probabilistic one: each compaction at level h
  * perturbs any rank by at most 2^h, and level h compacts at most
  * n/(k·2^h) times, so total rank error is bounded by
  * (#levels · n/k) / 2 — with k = 400 and n = 6·10^5 (sf0.1 lineitem)
  * that is ~1.6% of n, comfortably inside the 5% contract the catalog
  * entry (q_sketch_quantile) asserts. Merge order across partial
  * aggregates shifts WHICH ranks are hit but never the bound.
  */
final class KllState(val k: Int) {
  /** levels(h) holds items of weight 2^h; only level 0 is unsorted
    * between compactions (compaction sorts the level it drains). */
  val levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(new ArrayBuffer[Double])
  /** Per-level compaction toggle: keep odd sorted positions when set,
    * even when clear; flipped on every compaction of that level. */
  val toggles: ArrayBuffer[Boolean] = ArrayBuffer(false)

  def insert(v: Double): Unit = {
    levels(0) += v
    var h = 0
    while (h < levels.length && levels(h).length >= k) { compact(h); h += 1 }
  }

  /** Sort level h, promote alternating positions of an EVEN count to
    * level h+1; an odd leftover (possible after merge concatenation —
    * the insert path always compacts even counts) stays at level h so
    * total weight is exactly preserved. */
  private def compact(h: Int): Unit = {
    if (h + 1 >= levels.length) {
      levels += new ArrayBuffer[Double]
      toggles += false
    }
    val buf = levels(h).sorted
    val even = buf.length & ~1
    val start = if (toggles(h)) 1 else 0
    toggles(h) = !toggles(h)
    val up = levels(h + 1)
    var i = start
    while (i < even) { up += buf(i); i += 2 }
    levels(h).clear()
    if (even < buf.length) levels(h) += buf(buf.length - 1)
  }

  def mergeIn(other: KllState): Unit = {
    var h = 0
    while (h < other.levels.length) {
      if (h >= levels.length) {
        levels += new ArrayBuffer[Double]
        toggles += false
      }
      levels(h) ++= other.levels(h)
      h += 1
    }
    h = 0
    while (h < levels.length) {
      if (levels(h).length >= k) compact(h)
      h += 1
    }
  }

  /** All retained (value, weight) pairs sorted by value — directly
    * rank-computable by the caller. */
  def sortedPairs(): (Array[Double], Array[Long]) = {
    var n = 0
    levels.foreach(n += _.length)
    val vs = new Array[Double](n)
    val ws = new Array[Long](n)
    var i = 0
    var h = 0
    while (h < levels.length) {
      val lvl = levels(h)
      val w = 1L << h
      var j = 0
      while (j < lvl.length) { vs(i) = lvl(j); ws(i) = w; i += 1; j += 1 }
      h += 1
    }
    val order = vs.zipWithIndex.sortBy(_._1).map(_._2)
    (order.map(vs), order.map(ws))
  }
}

/** Quantile (KLL) sketch aggregate over a DOUBLE column: returns a
  * struct of parallel arrays (v: array<double>, w: array<bigint>)
  * sorted by value, from which any quantile is one weighted-rank scan
  * (see [[KllState]] for the error contract). Spark's own
  * approx_percentile is a non-mergeable-by-SQL single expression with
  * implementation-defined internals; this sketch is an explicit,
  * bounded-state, mergeable surface like [[KmvSketchAgg]].
  */
final case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState]
  with UnaryLike[Expression] {

  require(k >= 8, s"kll sketch capacity must be >= 8, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll requires a DOUBLE input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("v", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("w", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = s"graft_kll_$k"

  override def createAggregationBuffer(): KllState = new KllState(k)

  override def update(buf: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllState, other: KllState): KllState = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: KllState): Any = {
    val (vs, ws) = buf.sortedPairs()
    new GenericInternalRow(Array[Any](
      new GenericArrayData(vs), new GenericArrayData(ws)))
  }

  override def serialize(buf: KllState): Array[Byte] = {
    var n = 0
    buf.levels.foreach(n += _.length)
    val bb = ByteBuffer.allocate(4 + buf.levels.length * 5 + 8 * n)
    bb.putInt(buf.levels.length)
    var h = 0
    while (h < buf.levels.length) {
      val lvl = buf.levels(h)
      bb.putInt(lvl.length)
      bb.put(if (buf.toggles(h)) 1.toByte else 0.toByte)
      var j = 0
      while (j < lvl.length) { bb.putDouble(lvl(j)); j += 1 }
      h += 1
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  override def deserialize(bytes: Array[Byte]): KllState = {
    val buf = new KllState(k)
    val bb = ByteBuffer.wrap(bytes)
    val nLevels = bb.getInt()
    var h = 0
    while (h < nLevels) {
      if (h >= buf.levels.length) {
        buf.levels += new ArrayBuffer[Double]
        buf.toggles += false
      }
      val len = bb.getInt()
      buf.toggles(h) = bb.get() == 1.toByte
      var j = 0
      while (j < len) { buf.levels(h) += bb.getDouble(); j += 1 }
      h += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}
