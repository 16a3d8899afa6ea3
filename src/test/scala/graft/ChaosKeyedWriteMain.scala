package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Forked-JVM chaos harness for the DSv2 keyed-table SINK: injects
  * exactly one task failure in the WRITE stage, mid-partition (after
  * rows have already streamed into the attempt's staged file), and
  * checks the retried write commits exactly-once — the first
  * attempt's partial file must never become visible rows. The fork
  * exists because task retries need a `local[N,maxFailures]` master
  * and the shared spec session is `local[4]` (maxFailures=1).
  *
  * Exit codes: 0 OK; 2 result mismatch (duplicates or losses); 3 the
  * injection never fired (vacuous run); other non-zero = job died.
  */
object ChaosKeyedWriteMain {
  private val fired = new java.util.concurrent.atomic.AtomicBoolean(false)

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
    import spark.implicits._

    // fail ONE first-attempt write task midway: rows below the fuse
    // have already been written to the attempt's inprogress file when
    // the exception fires, so a visibility bug (reading staged bytes)
    // would double them. nondeterministic pins the udf ABOVE the
    // sink's required-distribution shuffle, in the write stage itself.
    val chaos = udf((k: Long) => {
      val tc = TaskContext.get()
      if (k % 100 == 57 && tc != null && tc.attemptNumber() == 0 &&
          fired.compareAndSet(false, true))
        throw new RuntimeException("graft-chaos: injected write-task failure")
      k
    }).asNondeterministic()

    val rows = spark.range(0, 10000).select(
      chaos(col("id")).as("k"),
      (col("id") % 97).cast("long").as("grp"),
      concat(lit("v"), col("id")).as("payload"))

    rows.write.format("graft.sources.KeyedTable")
      .option("key", "k").option("writePartitions", "4")
      .mode("append").save(target)

    if (!fired.get()) { System.err.println("injection never fired"); sys.exit(3) }

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
    println("[chaos-ktable] OK")
    spark.stop()
  }
}
