package graft

import graft.pipeline.V2KeyedTableSink
import graft.sources.{KeyedTable, KeyedTableOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Per-file Bloom filters on DECLARED columns: sidecar write + the
  * file-pruning matrix for equality probes zone maps cannot serve
  * (high-cardinality values over unsorted data). */
class BloomPruneSpec extends SparkSpecBase {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // h is HIGH-CARDINALITY and UNSORTED relative to k's clustering:
  // every file's [min, max] zone spans ~the whole space, so only the
  // blooms can prune an equality probe
  private def rows(lo: Long, hi: Long): DataFrame = {
    val s = spark
    import s.implicits._
    (lo until hi).map(k => (k, f"${k * 2654435761L % 100003}%05d-$k", k * 10L))
      .toDF("k", "h", "c")
  }

  private def readBack(t: String): DataFrame =
    spark.read.format("graft.sources.KeyedTable").load(t)

  private def plannedFiles(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[BatchScanExec] =
      p.collect {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case b: BatchScanExec => Seq(b)
      }.flatten
    val scans = walk(df.queryExecution.executedPlan)
    assert(scans.size == 1)
    scans.head.inputRDD.getNumPartitions
  }

  private def hOf(k: Long): String = f"${k * 2654435761L % 100003}%05d-$k"

  test("declared bloom columns write sidecars; equality probes prune " +
      "files zone maps keep") {
    val t = tmpDir("graft_bloom_") + "/t"
    val sink = V2KeyedTableSink("k", writeParallelism = 4)
    // declaration BEFORE the first write: every commit gets sidecars
    KeyedTableOps.declareTable(t, "k", 4)
    KeyedTableOps.declareBloomColumns(t, Seq("h"))
    sink.append(rows(0, 400), t)
    sink.append(rows(400, 800), t)
    val committed = KeyedTable.committedFiles(t)
    assert(committed.size === 8, s"2 commits x 4 buckets: $committed")

    // one sidecar per data file, dot-prefixed (invisible to listings)
    val dataDir = new java.io.File(s"$t/data")
    val sidecars = dataDir.listFiles().map(_.getName)
      .filter(_.startsWith(".bloom-")).toSet
    assert(sidecars === committed.map(f => s".bloom-$f").toSet,
      s"sidecar set mismatch: $sidecars")

    // the control: zone maps alone CANNOT prune this probe (h is
    // unsorted high-cardinality — every file's range spans it).
    // Present value: found, and only bloom-surviving files planned
    val present = readBack(t).where(col("h") === hOf(123L))
    val plannedPresent = plannedFiles(present)
    assert(present.collect().map(_.getLong(0)).toSeq === Seq(123L))
    assert(plannedPresent >= 1 && plannedPresent < committed.size,
      s"present-value probe planned $plannedPresent of ${committed.size}")

    // absent value IN-RANGE (sorts inside every file's zone span, so
    // zone maps keep all 8 — only the blooms can prune): plans nothing
    val absent = readBack(t).where(col("h") === "50000-absent")
    assert(plannedFiles(absent) === 0,
      "absent-value probe must prune every file via the blooms")
    assert(absent.count() === 0L)

    // IN-list: one present + one absent literal — files holding the
    // present literal survive
    val inq = readBack(t).where(col("h").isin(hOf(555L), "50000-nope"))
    assert(plannedFiles(inq) < committed.size)
    assert(inq.collect().map(_.getLong(0)).toSeq === Seq(555L))

    // non-equality predicates never consult blooms (ranges are the
    // zone maps' job): full scan of the column stays correct
    assert(readBack(t).where(col("h") >= "0").count() === 800L)
  }

  test("undeclared tables and pre-declaration files stay bloom-less " +
      "and unpruned (advisory, never wrong)") {
    val t = tmpDir("graft_bloom_late_") + "/t"
    val sink = V2KeyedTableSink("k", writeParallelism = 4)
    sink.append(rows(0, 100), t) // NO declaration yet
    assert(!new java.io.File(s"$t/data").listFiles()
      .exists(_.getName.startsWith(".bloom-")), "no sidecars undeclared")
    // in-range absent literal (zone maps keep everything)
    val absentH = "50000-absent"
    val before = plannedFiles(readBack(t).where(col("h") === absentH))
    assert(before === KeyedTable.committedFiles(t).size,
      "bloom-less files must all stay planned")

    // declare late: NEW commits bloom, old files stay planned until a
    // fold re-homes them
    KeyedTableOps.declareBloomColumns(t, Seq("h"))
    sink.append(rows(100, 200), t)
    val absent = readBack(t).where(col("h") === absentH)
    assert(plannedFiles(absent) === 4,
      "post-declaration files prune, pre-declaration files stay")

    // a fold rewrites everything under the declaration: now all prune
    assert(KeyedTableOps.rewriteCompact(spark, t, tombstoneGraceMs = 0)
      .isDefined)
    assert(plannedFiles(readBack(t).where(col("h") === absentH)) === 0,
      "folded files must carry blooms")
    // correctness unchanged throughout
    assert(readBack(t).where(col("h") === hOf(150L))
      .collect().map(_.getLong(0)).toSeq === Seq(150L))
  }

  test("vacuum reaps a sidecar with its data file, never a live one") {
    val t = tmpDir("graft_bloom_vac_") + "/t"
    val sink = V2KeyedTableSink("k", writeParallelism = 2)
    KeyedTableOps.declareTable(t, "k", 2)
    KeyedTableOps.declareBloomColumns(t, Seq("h"))
    sink.append(rows(0, 50), t)
    sink.append(rows(50, 100), t)
    assert(KeyedTableOps.rewriteCompact(spark, t, tombstoneGraceMs = 0)
      .isDefined)
    val live = KeyedTable.liveFiles(t).toSet
    val reaped = KeyedTable.vacuum(t, graceMs = 0L).toSet
    val left = new java.io.File(s"$t/data").listFiles()
      .map(_.getName).filter(_.startsWith(".bloom-")).toSet
    assert(left === live.map(f => s".bloom-$f"),
      s"exactly the live files' sidecars must survive: left=$left " +
        s"reaped=$reaped")
    // pruning still works off the folded files' sidecars
    assert(readBack(t).where(col("h") === hOf(42L))
      .collect().map(_.getLong(0)).toSeq === Seq(42L))
  }

  test("bloom membership is exact on every supported probe type") {
    val s = spark
    import s.implicits._
    val t = tmpDir("graft_bloom_types_") + "/t"
    KeyedTableOps.declareTable(t, "k", 2)
    KeyedTableOps.declareBloomColumns(t, Seq("h", "c", "d"))
    (0L until 200L).map(k => (k, s"x$k", k * 3L, k / 7.0))
      .toDF("k", "h", "c", "d")
      .write.format("graft.sources.KeyedTable")
      .option("key", "k").option("writePartitions", "2")
      .mode("append").save(t)
    def probe(c: org.apache.spark.sql.Column, want: Long): Unit = {
      val got = readBack(t).where(c).collect().map(_.getLong(0)).toSeq
      assert(got === Seq(want), s"probe $c got $got")
    }
    probe(col("h") === "x77", 77L) // string
    probe(col("c") === 33L, 11L) // long
    probe(col("d") === (140L / 7.0), 140L) // double
    // in-range absent long (c holds multiples of 3; 100 is not one)
    assert(readBack(t).where(col("c") === 100L).count() === 0L)
    assert(plannedFiles(readBack(t).where(col("c") === 100L)) === 0)
  }
}
