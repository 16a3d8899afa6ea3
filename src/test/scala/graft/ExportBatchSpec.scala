package graft

import graft.queries.MigrationQueries
import org.apache.spark.sql.functions._

/** Pins the resume contract of q_migrate_export_batches: batches are
  * contiguous, disjoint, exactly sized, and — the property a bulk
  * loader's crash recovery rests on — recomputing the batching over
  * only the keys PAST a committed cursor reproduces the remaining
  * batches exactly (same boundaries, same sizes, shifted ids).
  */
class ExportBatchSpec extends SparkSpecBase {

  private def batches(minKeyExclusive: Long): Seq[(Long, Long, Long, Long)] =
    MigrationQueries.exportBatches(
      Tables(spark, sfDir, "orders")
        .where(col("o_orderkey") > minKeyExclusive)
        .select(col("o_orderkey").as("key")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq

  test("batches are contiguous, disjoint, exactly sized; resume reproduces the tail") {
    val full = batches(Long.MinValue)
    assert(full.nonEmpty)
    // exactly 1000 rows per batch except possibly the last
    full.init.foreach { case (b, n, _, _) => assert(n === 1000L, s"batch $b") }
    // ids contiguous from 0; cursor ranges strictly ascending, disjoint
    assert(full.map(_._1) === full.indices.map(_.toLong))
    full.sliding(2).foreach {
      case Seq((_, _, _, hiA), (_, _, loB, _)) => assert(hiA < loB)
      case _ =>
    }
    // crash after batch 1 commits: resume from its cursor_hi
    val cursor = full(1)._4
    val resumed = batches(cursor)
    val expectedTail = full.drop(2).map { case (b, n, lo, hi) => (b - 2, n, lo, hi) }
    assert(resumed === expectedTail,
      s"resume from cursor $cursor diverged:\n$resumed\nvs\n$expectedTail")
  }
}
