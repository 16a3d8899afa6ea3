package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Forked-JVM chaos harness for the DSv2 keyed-table SINK: the
  * `chaosWriteKey` table option makes the DataWriter itself throw on
  * its FIRST attempt right after the poisoned key's row is in the
  * staged file — a genuine WRITE-STAGE failure with a partially
  * written `.inprogress` file on disk at the moment of death. (A
  * failing udf in the query would land BELOW the sink's
  * required-distribution exchange, in the map stage, and never touch
  * the writer.) The retried attempt must commit exactly-once: the
  * first attempt's partial file is aborted/unmanifested, never rows.
  * The fork exists because task retries need `local[N,maxFailures]`
  * and the shared spec session is `local[4]` (maxFailures=1).
  *
  * Exit codes: 0 OK; 2 result mismatch (duplicates or losses); 3 the
  * injection never fired (vacuous run — e.g. the chaosWriteKey option
  * silently unplumbed); other non-zero = job died (retry did not
  * recover).
  */
object ChaosKeyedWriteMain {
  def main(args: Array[String]): Unit = {
    val target = java.nio.file.Files
      .createTempDirectory("graft_ktable_chaos_").toString + "/t"
    val spark = SparkSession.builder()
      .master("local[4,3]") // task retries enabled
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // vacuous-run guard: the injected death must be OBSERVED as a real
    // failed task, or a silently unplumbed chaos option would make
    // this whole harness pass without testing anything
    val failedTasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        e.reason match {
          case _: org.apache.spark.TaskFailedReason =>
            failedTasks.incrementAndGet(); ()
          case _ => ()
        }
    })

    // poison key 5057: its task dies mid-file on attempt 0 with ~half
    // its shard already streamed into the inprogress file
    val rows = spark.range(0, 10000).select(
      col("id").as("k"),
      (col("id") % 97).cast("long").as("grp"),
      concat(lit("v"), col("id")).as("payload"))

    rows.write.format("graft.sources.KeyedTable")
      .option("key", "k").option("writePartitions", "4")
      .option("chaosWriteKey", "5057")
      .mode("append").save(target)

    // listener delivery is async — poll with a bounded deadline (a
    // fixed sleep flakes on a loaded box), then require the injected
    // write-task death actually happened
    val deadline = System.currentTimeMillis() + 30000
    while (failedTasks.get() < 1 && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    if (failedTasks.get() < 1) {
      System.err.println("injection never fired (no failed task observed)")
      sys.exit(3)
    }

    val got = spark.read.format("graft.sources.KeyedTable").load(target)
    val n = got.count()
    val nd = got.select("k").distinct().count()
    val chk = got.agg(sum(col("k") * col("grp"))).head.getLong(0)
    val wantChk = spark.range(0, 10000)
      .agg(sum(col("id") * (col("id") % 97))).head.getLong(0)
    if (n != 10000L || nd != 10000L || chk != wantChk) {
      System.err.println(s"mismatch: n=$n distinct=$nd chk=$chk want=$wantChk")
      sys.exit(2)
    }
    // the first attempt's partial file must be gone (task abort) or at
    // worst unmanifested garbage — either way, invisible; and exactly
    // 4 shards are committed (one per retried write partition)
    val committed = new java.io.File(s"$target/_commits").listFiles()
      .filter(_.getName.endsWith(".manifest"))
      .flatMap(f => java.nio.file.Files.readAllLines(f.toPath)
        .toArray(Array.empty[String]))
      .count(l => l.nonEmpty && !l.startsWith("#")) // skip version headers
    if (committed != 4) {
      System.err.println(s"expected 4 committed shards, got $committed")
      sys.exit(2)
    }
    println("[chaos-ktable] OK")
    spark.stop()
  }
}
