package graft

import graft.pipeline.Layout
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions.col

/** Pins that [[Layout.stageClustered]] actually changes the physical
  * read profile: under a tight key-band predicate, a range-clustered
  * staging emits only the matching stripe's rows from the parquet scan
  * (row-group stats skip), while the reference-style round-robin
  * staging reads the whole table. Correctness gates can't see this —
  * both layouts return identical query results. */
class LayoutSpec extends SparkSpecBase {

  private def allScans(p: SparkPlan): Seq[FileSourceScanExec] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case _ => Nil
    }
    here ++ p.children.flatMap(allScans) ++ p.subqueries.flatMap(allScans)
  }

  /** Rows the parquet scan emits for `key <= bound` over `dir` (with
    * vectorized reads, that is exactly the rows of the row groups
    * whose min/max overlap the predicate). */
  private def rowsScanned(dir: String, key: String, bound: Long): (Long, Long) = {
    val df = spark.read.parquet(dir).where(col(key) <= bound)
    val matches = df.count()
    // count() prunes columns but keeps the pushed filter; re-run with
    // collect so the scan metric reflects a real projection
    val df2 = spark.read.parquet(dir).where(col(key) <= bound)
    df2.collect()
    val scan = allScans(df2.queryExecution.executedPlan)
      .headOption.getOrElse(fail("no file scan in plan"))
    (scan.metrics("numOutputRows").value, matches)
  }

  test("range-clustered staging prunes row groups; round-robin reads everything") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val total = li.count()
    val maxKey = li.agg(org.apache.spark.sql.functions.max("l_orderkey"))
      .head().getLong(0)
    val bound = maxKey / 16 // ~1 of 8 range stripes overlaps

    val base = java.nio.file.Files.createTempDirectory("graft_layout_")
    val clusteredDir = base.resolve("clustered").toString
    val roundRobinDir = base.resolve("roundrobin").toString
    Layout.stageClustered(li, clusteredDir, 8, "l_orderkey")
    li.repartition(8).write.mode("overwrite").parquet(roundRobinDir)

    val (clusteredRead, m1) = rowsScanned(clusteredDir, "l_orderkey", bound)
    val (rrRead, m2) = rowsScanned(roundRobinDir, "l_orderkey", bound)
    assert(m1 === m2, "layout must not change results")
    assert(m1 > 0, "band must match some rows")

    // round-robin: every file spans the key domain → nothing skips
    assert(rrRead === total,
      s"round-robin staging should read all $total rows, read $rrRead")
    // clustered: only the overlapping stripe(s) are read
    assert(clusteredRead <= total / 4,
      s"clustered staging should read <= ${total / 4} rows, read $clusteredRead")
    assert(clusteredRead >= m1)
  }

  test("z-order layout prunes on BOTH keys; single-key layout prunes on one") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val total = li.count()
    def maxOf(c: String) =
      li.agg(org.apache.spark.sql.functions.max(col(c))).head().getLong(0)
    val boundA = maxOf("l_orderkey") / 16
    val boundB = maxOf("l_partkey") / 16

    val base = java.nio.file.Files.createTempDirectory("graft_zorder_")
    val zDir = base.resolve("zorder").toString
    val singleDir = base.resolve("single").toString
    Layout.stageZOrdered(li, zDir, 16, "l_orderkey", "l_partkey")
    Layout.stageClustered(li, singleDir, 16, "l_orderkey")

    val (zA, mzA) = rowsScanned(zDir, "l_orderkey", boundA)
    val (zB, mzB) = rowsScanned(zDir, "l_partkey", boundB)
    val (sA, msA) = rowsScanned(singleDir, "l_orderkey", boundA)
    val (sB, msB) = rowsScanned(singleDir, "l_partkey", boundB)
    assert(mzA === msA); assert(mzB === msB) // layout never changes results
    assert(mzA > 0 && mzB > 0)

    // single-key: razor-sharp on its own key, useless on the other
    assert(sA <= total / 4, s"single-key layout should prune key A hard: $sA")
    assert(sB === total, s"single-key layout cannot prune key B: $sB vs $total")
    // z-order: meaningful pruning on BOTH keys (the sqrt trade-off —
    // neither as sharp as the dedicated key, both far below a full scan)
    assert(zA <= total / 2, s"z-order should prune key A: $zA of $total")
    assert(zB <= total / 2, s"z-order should prune key B: $zB of $total")
    assert(zA >= mzA && zB >= mzB)

    // the shuffle-bounded uniform-bucket variant prunes comparably on
    // these (uniform-ish) keys — and never worse than a full scan
    val uDir = base.resolve("zuniform").toString
    Layout.clusterZOrderUniform(li, 16, "l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(uDir)
    val (uA, muA) = rowsScanned(uDir, "l_orderkey", boundA)
    val (uB, muB) = rowsScanned(uDir, "l_partkey", boundB)
    assert(muA === mzA && muB === mzB)
    assert(uA <= total / 2, s"uniform z-order should prune key A: $uA of $total")
    assert(uB <= total / 2, s"uniform z-order should prune key B: $uB of $total")
  }

  test("compact: a small-files mess becomes right-sized, clustered, lossless files") {
    import org.apache.spark.sql.functions.col
    val src = java.nio.file.Files.createTempDirectory("graft_smallfiles_").toString
    val dst = java.nio.file.Files.createTempDirectory("graft_compacted_").toString
    // model incremental ingestion: 64 sliver files
    val li = Tables(spark, sfDir, "lineitem")
    li.repartition(64).write.mode("overwrite").parquet(src)
    val srcFiles = new java.io.File(src).listFiles().count(_.getName.endsWith(".parquet"))
    assert(srcFiles >= 60, s"expected a small-files mess, got $srcFiles")

    val total = li.count()
    val target = 2000L
    val written = pipeline.Layout.compact(spark, src, dst, target, "l_orderkey")
    val expect = math.ceil(total.toDouble / target).toInt
    // range-sampling skew can overfill a range; maxRecordsPerFile then
    // splits it — near-ideal, never a mess
    assert(written >= expect && written <= expect + 2,
      s"expected ~$expect right-sized files, got $written")
    assert(written * 10 < srcFiles, s"compaction barely reduced files: $written")
    // lossless
    val back = spark.read.parquet(dst)
    assert(back.count() === total)
    // and clustered: an orderkey band must NOT read every row group
    val bound = back.agg(org.apache.spark.sql.functions.max(col("l_orderkey")))
      .head().getLong(0) / 10
    val scanned = {
      val df = back.where(col("l_orderkey") <= bound)
      df.collect()
      val leaves = df.queryExecution.executedPlan.collectLeaves()
      leaves.map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
    }
    assert(scanned < total, s"compacted layout should prune: scanned $scanned of $total")
  }
}
