package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Guards the events.ts normalization: the fixture has shipped ts as
  * parquet TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across driver
  * regenerations (ROADMAP round 7), and every events query assumes
  * `graft.Tables` delivers session-TZ TIMESTAMP at micros precision
  * whichever generation is on disk. A regression here fails ~60
  * catalog entries at ANALYSIS, so it gets its own spec. */
class EventsTsSpec extends SparkSpecBase {

  test("Tables normalizes events.ts to TimestampType with sane epoch range") {
    val ev = Tables(spark, sfDir, "events")
    assert(ev.schema("ts").dataType === TimestampType,
      s"ts must normalize to session-TZ TIMESTAMP, got ${ev.schema("ts")}")
    val r = ev.agg(
      min(unix_micros(col("ts"))).as("mn"),
      max(unix_micros(col("ts"))).as("mx")).head()
    val (mn, mx) = (r.getLong(0), r.getLong(1))
    // fixture events are generated in 2024 — a unit slip (nanos read
    // as micros, or seconds) lands centuries away from this window
    val lo = 1700000000000000L // 2023-11-14
    val hi = 1800000000000000L // 2027-01-15
    assert(mn >= lo && mx <= hi && mn <= mx,
      s"epoch range [$mn, $mx] outside the plausible fixture window " +
        "— ts unit conversion is broken")
  }

  test("streaming readEvents agrees with the batch Tables view") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tsprobe_")
    // stage via a raw-footer copy so the staged file keeps the fixture
    // generation's physical ts type (a Tables-based rewrite would
    // normalize it and the probe under test would see nothing); assert
    // the source shape first so a future multi-file fixture fails here
    // with a clear message instead of as a confusing reader error.
    val src = java.nio.file.Paths.get(s"$sfDir/events.parquet")
    assert(java.nio.file.Files.isRegularFile(src),
      s"$src is not a regular file — fixture now ships events as a " +
        "directory; stage every part file here instead of one copy")
    java.nio.file.Files.copy(src, dir.resolve("events.parquet"))
    val streamed = streaming.EventStream.readEvents(spark, dir.toString)
    assert(streamed.schema("ts").dataType === TimestampType)
    val q = streamed
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .writeStream.format("memory").queryName("ts_probe")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "probe stream did not finish")
    val got = spark.table("ts_probe").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = Tables(spark, sfDir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.nonEmpty && got === want,
      "stream and batch readers disagree on ts values")
  }
}
