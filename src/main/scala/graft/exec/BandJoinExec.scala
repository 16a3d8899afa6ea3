package graft.exec

import graft.plans.BandJoinPattern
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Cast, Expression, JoinedRow, Literal, Predicate, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Routes pairs whose key already IS the target partition id — the
  * shape `UnsafeRowSerializer` requires (it never ships the key). */
private[exec] final class IdPartitioner(override val numPartitions: Int)
    extends org.apache.spark.Partitioner {
  override def getPartition(key: Any): Int = key.asInstanceOf[Int]
}

/** Physical band join: the (c)-tier custom operator of SURVEY.md §7.3
  * — Spark has no band-join strategy, so a plain
  * `x BETWEEN y - w1 AND y + w2` plans as a nested-loop cross product.
  * This operator executes it as a single bucketed shuffle:
  *
  *  - LEFT rows shuffle once to bucket(x), with W = w1 + w2;
  *  - RIGHT rows replicate to the (≤ 2, sometimes 3) consecutive
  *    buckets their band can touch — bounded fan-out, unlike the
  *    unbounded broadcast of a nested-loop plan;
  *  - each bucket sorts its left rows by the band key once, then each
  *    right row binary-searches its [y − w1, y + w2] slice and
  *    re-checks the FULL original condition per candidate, so the
  *    output is exactly the BETWEEN-join output at one-shuffle cost.
  *
  * A pair can only meet in bucket(x) (the left row lives in exactly
  * one bucket, the right row's replicas are distinct buckets), so no
  * dedup is needed. Bucket arithmetic is exact-LONG for integral
  * operands and IEEE floor-division otherwise, shared with the
  * rewrite-rule path via [[BandJoinPattern]]. Null band operands emit
  * nothing (inner-join semantics). The per-bucket probe is
  * O(n log n + output) in the bucket's rows — the sweep's slice
  * bounds use the SAME shifted-endpoint arithmetic as the original
  * predicate, so it can only admit (never drop) candidates relative
  * to the BETWEEN conjuncts; the residual re-check then restores
  * exactness for any extra conjuncts.
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

  /** Order-preserving Long image of an IEEE double (sign-magnitude →
    * two's-complement flip); −0.0 collapses onto +0.0 first because
    * they are IEEE-equal but have distinct bit patterns, and a bound
    * of one must still reach keys of the other. NaN maps above +Inf,
    * where a NaN bound selects an empty slice and a NaN key is only
    * reachable from a NaN bound — either way the residual predicate
    * (IEEE compare, always false on NaN) keeps the output exact. */
  private def fpKey(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(if (d == 0.0) 0.0 else d)
    if (b >= 0) b else b ^ Long.MaxValue
  }

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
    // un-bucketed band key / endpoints, for the in-bucket sweep
    val keyType = if (integral) LongType else DoubleType
    val xKey = Cast(x, keyType)
    val loEnd = Cast(BandJoinPattern.shift(y, w1, -1, integral), keyType)
    val hiEnd = Cast(BandJoinPattern.shift(y, w2, 1, integral), keyType)
    val condExpr = cond
    val numParts = conf.numShufflePartitions
    val isIntegral = integral
    val nL = leftOut.size
    val nR = rightOut.size

    // The shuffle wire format is Spark's own UnsafeRowSerializer — raw
    // Tungsten bytes, zero per-record object framing (Kryo was
    // measured ~parity with the SQL rewrite; raw rows beat it). That
    // serializer neither ships pair keys nor accepts non-Int ones
    // (Exchange contract: the key IS the partition id), so the bucket
    // id rides IN the row as a trailing non-null long column, the pair
    // key is the precomputed partition id (same hash both sides), and
    // the reduce side re-reads the bucket from the row.
    def pidOf(b: Long): Int = {
      val h = (b ^ (b >>> 32)).toInt // Long.hashCode
      val m = h % numParts
      if (m < 0) m + numParts else m
    }
    // Map-side rows are emitted WITHOUT copying: the shuffle writer
    // serializes each record before the next is pulled (bypass and
    // serialized writers both stream records straight into their
    // serializer; the object-buffering SortShuffleWriter is never
    // chosen because UnsafeRowSerializer supports relocation), so the
    // projection's reused buffer — even mutated between the right
    // side's replica emissions — is safe on the wire.
    val lKeyed: RDD[(Int, UnsafeRow)] = left.execute().mapPartitions { it =>
      val proj = UnsafeProjection.create(leftOut :+ lBucket, leftOut)
      it.flatMap { row =>
        val c = proj(row)
        if (c.isNullAt(nL)) Iterator.empty // null band key joins nothing
        else Iterator.single((pidOf(c.getLong(nL)), c))
      }
    }
    val rKeyed: RDD[(Int, UnsafeRow)] = right.execute().mapPartitions { it =>
      val boundsProj = UnsafeProjection.create(Seq(rLo, rHi), rightOut)
      val proj = UnsafeProjection.create(
        rightOut :+ Literal(0L).asInstanceOf[Expression], rightOut)
      it.flatMap { row =>
        val k = boundsProj(row)
        if (k.isNullAt(0) || k.isNullAt(1)) Iterator.empty
        else {
          val base = proj(row)
          (k.getLong(0) to k.getLong(1)).iterator.map { b =>
            base.setLong(nR, b); (pidOf(b), base)
          }
        }
      }
    }

    // Two plain hash shuffles aligned on the same partitioner, zipped —
    // NOT a cogroup: CoGroupedRDD routes every row of BOTH sides
    // through an ExternalAppendOnlyMap building per-key CompactBuffers
    // (measured ~1/3 of this operator's time). Here only the build
    // (left) side is buffered, into per-bucket arrays, and the probe
    // (right) side streams straight off the shuffle.
    val part = new IdPartitioner(numParts)
    def shuffled(rdd: RDD[(Int, UnsafeRow)], numFields: Int): RDD[(Int, UnsafeRow)] =
      new org.apache.spark.rdd.ShuffledRDD[Int, UnsafeRow, UnsafeRow](rdd, part)
        .setSerializer(org.apache.spark.sql.graftshim.RowWire.serializer(numFields))
    // bucket columns are invisible downstream: every expression below
    // binds against the widened schemas, outputs project them away
    val bL = AttributeReference("__graft_bucket_l", LongType, nullable = false)()
    val bR = AttributeReference("__graft_bucket_r", LongType, nullable = false)()
    val leftWide = leftOut :+ bL
    val rightWide = rightOut :+ bR
    shuffled(lKeyed, nL + 1).zipPartitions(shuffled(rKeyed, nR + 1)) { (lit, rit) =>
      val joined = new JoinedRow
      val pred = Predicate.create(condExpr, leftWide ++ rightWide)
      // downstream operators expect UnsafeRow (reused-buffer contract)
      val outProj = UnsafeProjection.create(leftOut ++ rightOut, leftWide ++ rightWide)
      val keyProj = UnsafeProjection.create(Seq(xKey), leftOut)
      val boundProj = UnsafeProjection.create(Seq(loEnd, hiEnd), rightOut)
      def sortKey(row: InternalRow): Long =
        if (isIntegral) row.getLong(0) else fpKey(row.getDouble(0))
      // build: bucket → left rows, each bucket key-sorted lazily on
      // first probe (x is non-null here — dropped at shuffle)
      final class Bucket(val ab: scala.collection.mutable.ArrayBuffer[UnsafeRow]) {
        var keys: Array[Long] = null
        var rows: Array[UnsafeRow] = null
        def sorted(): Unit = if (keys == null) {
          val pairs = ab.iterator.map(l => (sortKey(keyProj(l)), l)).toArray.sortBy(_._1)
          keys = pairs.map(_._1); rows = pairs.map(_._2)
        }
      }
      // UnsafeRowSerializer drops pair keys on the wire — the bucket
      // id is re-read from the trailing row column instead. It also
      // REUSES one row buffer across records on read, so the buffered
      // build side must copy; the streaming probe side is consumed
      // record-at-a-time and needs no copy.
      val buckets = new java.util.HashMap[Long, Bucket]()
      lit.foreach { case (_, row) =>
        val b = row.getLong(nL)
        var bk = buckets.get(b)
        if (bk == null) { bk = new Bucket(scala.collection.mutable.ArrayBuffer.empty); buckets.put(b, bk) }
        bk.ab += row.copy()
      }
      if (buckets.isEmpty) Iterator.empty
      else rit.flatMap { case (_, r) =>
        val bk = buckets.get(r.getLong(nR))
        if (bk == null) Iterator.empty
        else {
          bk.sorted()
          val keys = bk.keys; val rows = bk.rows
          val bounds = boundProj(r)
          val lo = sortKey(bounds)
          val hi = if (isIntegral) bounds.getLong(1) else fpKey(bounds.getDouble(1))
          // first index with keys(i) >= lo
          var s = 0; var e = keys.length
          while (s < e) { val m = (s + e) >>> 1; if (keys(m) < lo) s = m + 1 else e = m }
          val from = s
          new Iterator[InternalRow] {
            private var i = from
            private var ready: InternalRow = null
            private def advance(): Unit =
              while (ready == null && i < keys.length && keys(i) <= hi) {
                if (pred.eval(joined(rows(i), r))) ready = outProj(joined)
                i += 1
              }
            override def hasNext: Boolean = { if (ready == null) advance(); ready != null }
            override def next(): InternalRow = {
              if (!hasNext) throw new NoSuchElementException
              val out = ready; ready = null; out
            }
          }
        }
      }
    }
  }
}
