package graft

import graft.streaming.{EventStream, StateProgress}
import graft.streaming.EventStream.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Measured bounded-state evidence: the catalog's watermark-eviction
  * claims asserted against the runtime's own state-store metrics
  * (StreamingQueryProgress.stateOperators), not against output
  * correctness — a store that never evicted would still hash-match
  * the DuckDB oracle at fixture scale while growing without bound at
  * 100 TB/day. Chunked MemoryStream delivery ratchets the watermark
  * batch by batch so eviction has to happen DURING the run. */
class StateProgressSpec extends SparkSpecBase {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def chunkedSample(nChunks: Int): Seq[Seq[Event]] = {
    val sample = Tables(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq
    assert(sample.nonEmpty)
    val per = math.max(1, sample.length / nChunks)
    sample.grouped(per).map(_.toSeq).toSeq
  }

  test("dedup store EVICTS behind the watermark: peak state is a horizon, not history") {
    val chunks = chunkedSample(8)
    val total = chunks.map(_.size.toLong).sum
    val input = MemoryStream[Event]
    val mon = StateProgress.attach(spark)
    val q = EventStream.dedupeWithinWatermark(input.toDS().toDF()).writeStream
      .format("memory").queryName("sp_dedup_out")
      .outputMode(OutputMode.Append()).start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()
    val samples = mon.detach(q)
    val (peak, removed, seen) = mon.boundedness(samples, "dedupe")
    assert(seen == total, s"listener missed batches: saw $seen of $total rows")
    assert(removed > 0,
      "the dedup store never evicted a key — state would grow forever")
    // the fixture spans days against a 10-minute horizon: the store
    // must hold a sliver of history, never most of it. 60% is a loose
    // ceiling (chunk boundaries are time-skewed), but an unbounded
    // store holds ~100% by the last batch and fails it hard.
    assert(peak < (total * 6) / 10,
      s"dedup store peaked at $peak of $total input rows — not horizon-bounded")
  }

  test("window-agg store DRAINS closed windows once the watermark passes them") {
    val chunks = chunkedSample(8)
    val maxTs = chunks.flatten.map(_.ts.getTime).max
    val input = MemoryStream[Event]
    val mon = StateProgress.attach(spark)
    val q = EventStream.windowedAgg(input.toDS().toDF()).writeStream
      .format("memory").queryName("sp_win_out")
      .outputMode(OutputMode.Append()).start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    // flush clocks: advance the watermark past every real window end
    input.addData(Seq(Event(-1L,
      new java.sql.Timestamp(maxTs + 2 * 3600 * 1000L), -1L, "flush", 0.0)))
    q.processAllAvailable()
    input.addData(Seq(Event(-2L,
      new java.sql.Timestamp(maxTs + 4 * 3600 * 1000L), -1L, "flush", 0.0)))
    q.processAllAvailable()
    q.stop()
    val samples = mon.detach(q)
    val (peak, removed, _) = mon.boundedness(samples, "stateStoreSave")
    assert(peak > 0, "no aggregate state observed — wrong operator name?")
    assert(removed > 0,
      "no window ever left the store — closed windows would accumulate forever")
    // after the final flush the store holds only the still-open tail
    // (the sentinel's own window): it must have drained nearly all of
    // the peak, not kept history
    val aggSamples = mon.forOperator(samples, "stateStoreSave")
    val lastBatch = aggSamples.map(_.batchId).max
    val finalRows = aggSamples.filter(_.batchId == lastBatch).map(_.rowsTotal).max
    assert(finalRows * 4 < peak,
      s"final state $finalRows vs peak $peak — the store did not drain")
  }
}
