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
  * `m.detach(q)` after the query stops; samples are driver-local.
  * Listener callbacks are async, so [[Monitor.detach]] takes the query
  * handles and reconciles against their own `recentProgress` (updated
  * synchronously by the stream-execution thread before the progress
  * event is even posted) — a progress event still in flight on the
  * listener bus can never truncate the sample set. Scoped per query
  * id: one monitor can watch a session running several queries.
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
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        buf.synchronized { buf ++= toSamples(e.progress); () }
    }

    spark.streams.addListener(listener)

    private def toSamples(
        p: org.apache.spark.sql.streaming.StreamingQueryProgress)
        : Seq[Sample] =
      p.stateOperators.toSeq.map { op =>
        Sample(p.id.toString, p.batchId, op.operatorName,
          op.numRowsTotal, op.numRowsUpdated, op.numRowsRemoved,
          op.memoryUsedBytes, p.numInputRows)
      }

    /** Stop listening and return every sample seen. Deterministic, no
      * quiesce heuristic: each stopped query's own `recentProgress`
      * (filled synchronously at batch completion, BEFORE the async
      * listener event is posted) is authoritative for the batches it
      * retains, so handle-derived samples replace listener samples
      * batch for batch — an event still in flight on a backed-up
      * listener bus cannot truncate the result. The listener buffer
      * only contributes batches the bounded `recentProgress` ring
      * (default 100 updates) has already evicted on very long runs. */
    def detach(queries: org.apache.spark.sql.streaming.StreamingQuery*)
        : Seq[Sample] = {
      spark.streams.removeListener(listener)
      val fromHandles = queries.flatMap(_.recentProgress.toSeq)
        .flatMap(toSamples)
      val covered = fromHandles.map(s => (s.queryId, s.batchId)).toSet
      val evicted = buf.synchronized(buf.toSeq)
        .filter(s => !covered((s.queryId, s.batchId)))
      (fromHandles ++ evicted).sortBy(s => (s.queryId, s.batchId))
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
