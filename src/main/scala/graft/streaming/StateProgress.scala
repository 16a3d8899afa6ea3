package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import scala.collection.mutable

/** Per-batch state-store accounting for a running streaming query —
  * the streaming twin of the batch pipeline's progress/count logging
  * (reference behavior: per-table progress percentages,
  * verizon_table_migration_Rakesh_filters.py:356-362, re-expressed for
  * the runtime the batch job doesn't have).
  *
  * Why this exists: every bounded-state claim in the streaming catalog
  * ("the watermark evicts dedup keys", "closed windows leave the
  * store") is an argument about STATE ROWS OVER TIME, which neither
  * the DuckDB output hash nor a plan lint can see — a dedup operator
  * that never evicted would still produce correct output at fixture
  * scale while growing without bound at 100 TB/day. This listener
  * captures `stateOperators` from each QueryProgressEvent (rows in
  * store, rows updated, rows removed by eviction, memory used) so a
  * test can assert the eviction actually happens: peak state stays a
  * fraction of input, and removals are non-zero once the watermark
  * moves.
  *
  * Usage: `val m = StateProgress.attach(spark)` before `start()`,
  * `m.detach()` after `awaitTermination`; samples are driver-local.
  * Listener callbacks are async — call [[detach]] (which does a final
  * drain) before reading. Scoped per query id: one monitor can watch a
  * session running several queries.
  */
object StateProgress {

  /** One stateful operator's footprint in one micro-batch. */
  final case class Sample(queryId: String, batchId: Long, opName: String,
      rowsTotal: Long, rowsUpdated: Long, rowsRemoved: Long,
      memoryBytes: Long, inputRows: Long)

  final class Monitor private[StateProgress] (spark: SparkSession) {
    private val buf = mutable.ArrayBuffer.empty[Sample]

    private val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val rows = p.stateOperators.map { op =>
          Sample(p.id.toString, p.batchId, op.operatorName,
            op.numRowsTotal, op.numRowsUpdated, op.numRowsRemoved,
            op.memoryUsedBytes, p.numInputRows)
        }
        buf.synchronized { buf ++= rows; () }
      }
    }

    spark.streams.addListener(listener)

    /** Stop listening and return every sample seen. Listener events
      * are delivered asynchronously (LiveListenerBus), so a query's
      * final progress can still be in flight when awaitTermination/
      * stop return — quiesce first: wait until the buffer stops
      * growing (two consecutive 50 ms windows with no new samples,
      * 5 s cap), THEN remove the listener and read. */
    def detach(): Seq[Sample] = {
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      var still = 0
      var last = buf.synchronized(buf.size)
      while (still < 2 && System.nanoTime() < deadline) {
        Thread.sleep(50)
        val n = buf.synchronized(buf.size)
        if (n == last) still += 1 else { still = 0; last = n }
      }
      spark.streams.removeListener(listener)
      buf.synchronized(buf.toSeq)
    }

    /** Samples for one operator (by substring of the operator name —
      * e.g. "dedupe", "stateStoreSave", "sessionWindow"). */
    def forOperator(samples: Seq[Sample], namePart: String): Seq[Sample] =
      samples.filter(_.opName.toLowerCase.contains(namePart.toLowerCase))

    /** The bounded-state verdict for one operator across a run: peak
      * rows ever held, total rows evicted, and total input rows — a
      * caller asserts `peakRows` stays well under `inputRows` (the
      * store holds a horizon, not history) and `removed > 0` (the
      * watermark is actually evicting). */
    def boundedness(samples: Seq[Sample], namePart: String):
        (Long, Long, Long) = {
      val ops = forOperator(samples, namePart)
      val peak = if (ops.isEmpty) 0L else ops.map(_.rowsTotal).max
      val removed = ops.map(_.rowsRemoved).sum
      // input rows are per-batch on the PROGRESS, duplicated across an
      // op's samples in the same batch — sum once per (query, batch)
      val input = ops.groupBy(s => (s.queryId, s.batchId))
        .map(_._2.head.inputRows).sum
      (peak, removed, input)
    }
  }

  def attach(spark: SparkSession): Monitor = new Monitor(spark)
}
