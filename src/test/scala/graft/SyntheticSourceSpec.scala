package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The DSv2 synthetic source's scale contracts, asserted on the
  * EXECUTED plan: column pruning reaches the reader (a projection
  * pays only for the fields it names) and the partition plan is the
  * requested parallel stripe set — the properties that make "generate
  * 100 TB" a number instead of a staging job. */
class SyntheticSourceSpec extends SparkSpecBase {

  private def load(rows: Long, parts: Int) =
    spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", rows.toString).option("partitions", parts.toString)
      .load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec = {
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.size == 1, s"expected one v2 scan, got ${scans.size}")
    scans.head
  }

  test("generates the deterministic corpus") {
    val df = load(1000, 4)
    assert(df.count() === 1000L)
    val r = df.where(col("doc_id") === 42L).head
    assert(r.getLong(1) === 42L % 9973L)
    assert(r.getLong(2) === 1704067200000000L + 42L * 1000000L)
    assert(r.getLong(3) === (42L * 31L) % 100000L)
    assert(r.getString(4) === "fr") // 42 % 4 = 2 -> langs(2)
    // disjoint stripes cover exactly [0, rows)
    assert(df.agg(min(col("doc_id")), max(col("doc_id")),
      countDistinct(col("doc_id"))).head.toSeq === Seq(0L, 999L, 1000L))
  }

  test("column pruning reaches the v2 reader") {
    val pruned = scanOf(load(1000, 4).select(col("user_id")))
    assert(pruned.scan.readSchema().fieldNames.toSeq === Seq("user_id"),
      s"projection did not prune the scan: ${pruned.scan.readSchema()}")
  }

  test("partition plan is the requested stripe set") {
    val scan = scanOf(load(1000, 8).select(col("doc_id")))
    assert(scan.inputRDD.getNumPartitions === 8)
    // short final stripe: 10 rows / 4 partitions = ceil 3-per -> 4 stripes
    val scan2 = scanOf(load(10, 4).select(col("doc_id")))
    assert(scan2.inputRDD.getNumPartitions === 4)
    // more partitions than rows: empty stripes are dropped, not planned
    val scan3 = scanOf(load(3, 8).select(col("doc_id")))
    assert(scan3.inputRDD.getNumPartitions === 3)
  }
}
