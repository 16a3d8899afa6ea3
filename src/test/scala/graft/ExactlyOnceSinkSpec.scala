package graft

import graft.sources.KeyedLog
import graft.streaming.ExactlyOnceBatchSink
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming exactly-once parity with the batch pipeline's marker
  * contract (ChaosSpec extended to streaming, VERDICT r8 item 7):
  * a KeyedLog tail drains through ExactlyOnceBatchSink, and a crash
  * on EITHER side of the write→streaming-checkpoint window must not
  * duplicate or lose a batch:
  *  - crash AFTER data write, BEFORE marker → the replayed batch
  *    overwrites the torn directory (no append-next-to-orphans);
  *  - crash AFTER marker, BEFORE the streaming checkpoint commit →
  *    the replayed batch sees the marker and skips (no double write).
  */
class ExactlyOnceSinkSpec extends SparkSpecBase {

  import spark.implicits._

  private def awaitFinished(
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val finished = q.awaitTermination(120000)
    if (!finished) q.stop()
    assert(finished, "streaming query did not finish within 120 s")
  }

  private def batch(ids: Range) =
    ids.map(i => (i.toLong, s"user_${i % 7}", s"payload_$i"))
      .toDF("event_id", "key", "payload")

  private val dataSchema = batch(0 until 1).schema

  private def collected(sink: ExactlyOnceBatchSink): Seq[(Long, String)] =
    sink.read(spark).select($"event_id", $"payload").as[(Long, String)]
      .collect().sorted.toSeq

  test("keyed-log tail drains exactly-once through the marker sink") {
    val base = Files.createTempDirectory("graft_eos_").toString
    val log = s"$base/log"
    val sink = ExactlyOnceBatchSink(s"$base/out", s"$base/markers")
    KeyedLog.append(batch(0 until 200), log, "key", 4, Seq(col("event_id")))
    val q = KeyedLog.readStream(spark, log, dataSchema, maxFilesPerTrigger = 2)
      .writeStream
      .foreachBatch(sink.foreachBatchFn)
      .option("checkpointLocation", s"$base/cp")
      .trigger(Trigger.AvailableNow())
      .start()
    awaitFinished(q)
    assert(collected(sink) ===
      (0 until 200).map(i => (i.toLong, s"payload_$i")).sorted)
    // the 4 log partitions at 2 files/trigger must have split the
    // drain into >1 micro-batch, or the replay tests below test nothing
    assert(sink.committedBatches(spark).size > 1)
  }

  test("crash between data write and marker: replay overwrites, no duplicates") {
    val base = Files.createTempDirectory("graft_eos_").toString
    val log = s"$base/log"
    val sink = ExactlyOnceBatchSink(s"$base/out", s"$base/markers")
    KeyedLog.append(batch(0 until 120), log, "key", 4, Seq(col("event_id")))
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def start() = KeyedLog.readStream(spark, log, dataSchema, 2)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        if (id == 1 && !crashed.getAndSet(true)) {
          // the failure mode under test: data fully lands, then the
          // process dies before the marker (and before the streaming
          // checkpoint advances)
          df.write.mode("overwrite").parquet(sink.batchDir(id))
          sys.error("injected crash between data write and marker")
        }
        sink.writeBatch(df, id); ()
      }
      .option("checkpointLocation", s"$base/cp")
      .trigger(Trigger.AvailableNow())
      .start()
    val q1 = start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    assert(crashed.get)
    // torn batch dir exists but is uncommitted → invisible to readers
    assert(!sink.committedBatches(spark).contains(1L))
    awaitFinished(start())
    assert(collected(sink) ===
      (0 until 120).map(i => (i.toLong, s"payload_$i")).sorted)
  }

  test("crash between marker and streaming checkpoint: replay skips, no double write") {
    val base = Files.createTempDirectory("graft_eos_").toString
    val log = s"$base/log"
    val sink = ExactlyOnceBatchSink(s"$base/out", s"$base/markers")
    KeyedLog.append(batch(0 until 120), log, "key", 4, Seq(col("event_id")))
    def start(fn: (org.apache.spark.sql.DataFrame, Long) => Unit) =
      KeyedLog.readStream(spark, log, dataSchema, 2)
        .writeStream
        .foreachBatch(fn)
        .option("checkpointLocation", s"$base/cp")
        .trigger(Trigger.AvailableNow())
        .start()
    awaitFinished(start(sink.foreachBatchFn))
    val batches = sink.committedBatches(spark)
    assert(batches.size > 1)
    // simulate the crash: the LAST batch's marker landed but its
    // streaming checkpoint commit did not — delete the commit file so
    // the restart re-delivers that batch with the same data
    val commits = new java.io.File(s"$base/cp/commits")
      .listFiles().filterNot(_.getName.startsWith(".")).sortBy(_.getName.toInt)
    assert(commits.last.delete(), "could not remove last streaming commit")
    // drop the checksum sidecar too — a stale .crc next to the
    // re-written commit file reads as a concurrent-writer conflict
    val crc = new java.io.File(commits.last.getParentFile,
      s".${commits.last.getName}.crc")
    if (crc.exists()) assert(crc.delete())
    val replayedWrites = new java.util.concurrent.atomic.AtomicInteger(0)
    awaitFinished(start { (df, id) =>
      if (sink.writeBatch(df, id)) replayedWrites.incrementAndGet(); ()
    })
    // the replayed batch hit the marker and skipped — nothing re-wrote
    assert(replayedWrites.get === 0,
      "replay of a marker-committed batch must not write")
    assert(collected(sink) ===
      (0 until 120).map(i => (i.toLong, s"payload_$i")).sorted)
    assert(sink.committedBatches(spark) === batches)
  }
}
