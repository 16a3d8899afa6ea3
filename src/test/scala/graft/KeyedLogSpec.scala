package graft

import graft.sources.KeyedLog
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The Kafka-shaped file log: stable key→partition mapping, dense
  * monotonic offsets across appends, offset replay, stream tailing. */
class KeyedLogSpec extends SparkSpecBase {

  import spark.implicits._

  private def freshDir() =
    Files.createTempDirectory("graft_log_").toString + "/log"

  private def batch(ids: Range) =
    ids.map(i => (i.toLong, s"user_${i % 7}", s"payload_$i"))
      .toDF("event_id", "key", "payload")

  test("appends assign dense per-partition offsets that continue") {
    val dir = freshDir()
    val ends1 = KeyedLog.append(batch(0 until 100), dir, "key", 4,
      Seq(col("event_id")))
    assert(ends1.values.sum === 100L)
    val ends2 = KeyedLog.append(batch(100 until 150), dir, "key", 4,
      Seq(col("event_id")))
    assert(ends2.values.sum === 150L)
    // dense: per partition, offsets are exactly 0..end-1
    val log = spark.read.parquet(dir)
    val perP = log.groupBy(col("__p"))
      .agg(count(lit(1)).as("n"), min(col("offset")).as("mn"),
        max(col("offset")).as("mx"), countDistinct(col("offset")).as("nd"))
      .collect()
    perP.foreach { r =>
      val (p, n, mn, mx, nd) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nd === n, s"p=$p offsets not distinct")
      assert(mn === 0L && mx === n - 1, s"p=$p offsets not dense 0..${n - 1}")
      assert(ends2(p) === n)
    }
  }

  test("same key always lands in the same partition") {
    val dir = freshDir()
    KeyedLog.append(batch(0 until 200), dir, "key", 4, Seq(col("event_id")))
    val parts = spark.read.parquet(dir)
      .groupBy(col("key")).agg(countDistinct(col("__p")).as("np"))
      .collect()
    assert(parts.nonEmpty)
    parts.foreach(r => assert(r.getLong(1) === 1L, s"key straddles partitions: $r"))
  }

  test("offset replay: readBatch(from) returns exactly the tail") {
    val dir = freshDir()
    val mid = KeyedLog.append(batch(0 until 100), dir, "key", 4,
      Seq(col("event_id")))
    KeyedLog.append(batch(100 until 160), dir, "key", 4, Seq(col("event_id")))
    val tail = KeyedLog.readBatch(spark, dir, mid)
    assert(tail.count() === 60)
    assert(tail.select("event_id").as[Long].collect().toSet ===
      (100L until 160L).toSet)
    // full replay
    assert(KeyedLog.readBatch(spark, dir).count() === 160)
  }

  test("checkpointed restart: resumes from committed offsets, no dupes/loss") {
    // the consumer-group semantics: a NEW query instance on the same
    // checkpoint must pick up exactly where the dead one committed —
    // rows consumed before the stop never re-deliver, rows appended
    // while down all deliver
    val base = Files.createTempDirectory("graft_log_ckpt_")
    val dir = base.resolve("log").toString
    val out = base.resolve("out").toString
    val cp = base.resolve("cp").toString
    val schema = batch(0 until 1).schema
    def runOnce(): Unit = {
      val q = KeyedLog.readStream(spark, dir, schema, maxFilesPerTrigger = 2)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    KeyedLog.append(batch(0 until 100), dir, "key", 4, Seq(col("event_id")))
    runOnce()
    assert(spark.read.parquet(out).count() === 100)
    KeyedLog.append(batch(100 until 160), dir, "key", 4, Seq(col("event_id")))
    runOnce() // restart: new query, same checkpoint
    val got = spark.read.parquet(out).select("event_id").as[Long].collect()
    assert(got.length === 160, "loss or duplication across restart")
    assert(got.toSet === (0L until 160L).toSet)
  }

  test("windowed agg over the keyed-log tail equals batch (kafka-shaped e2e)") {
    // the full shape a production pipeline runs: producer appends the
    // fixture into the partitioned offset log in two batches, the
    // streaming consumer tails it into the watermarked windowed
    // aggregate, and the result must equal the batch twin over the
    // raw table (q_stream_window_batch's oracled expressions)
    import graft.streaming.EventStream
    val dir = freshDir()
    val ev = Tables(spark, sfDir, "events")
    KeyedLog.append(ev.where("event_id % 2 = 0"), dir, "user_id", 4,
      Seq(col("event_id")))
    KeyedLog.append(ev.where("event_id % 2 = 1"), dir, "user_id", 4,
      Seq(col("event_id")))
    val tail = KeyedLog.readStream(spark, dir, ev.schema, maxFilesPerTrigger = 4)
      .drop("offset", "__p")
    val q = EventStream.windowedAgg(tail).writeStream
      .format("memory").queryName("klog_win")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("window_start_us", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val got = canon(spark.table("klog_win"))
    val want = canon(EventStream.windowedAgg(ev))
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("stream tail: availableNow consumption sees every appended row") {
    val dir = freshDir()
    KeyedLog.append(batch(0 until 120), dir, "key", 4, Seq(col("event_id")))
    val schema = batch(0 until 1).schema
    val q = KeyedLog.readStream(spark, dir, schema, maxFilesPerTrigger = 2)
      .writeStream.format("memory").queryName("log_tail")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("log_tail")
    assert(got.count() === 120)
    assert(got.select("event_id").as[Long].collect().toSet ===
      (0L until 120L).toSet)
    // the partition column and ledger column both surface
    assert(got.columns.contains("__p") && got.columns.contains("offset"))
  }
}
