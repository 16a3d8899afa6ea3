package graft

import graft.queries.RelationalQueries
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Pins that q_partition_prune's fact scan is pruned at RUNTIME by the
  * dim side (dynamic partition pruning): the fact has no static filter
  * on the partition column, so without DPP the scan reads all 12 month
  * partitions and the plan "works" at 12/3 = 4× the I/O — precisely
  * the regression that stays invisible in a correctness-only gate. */
class DppSpec extends SparkSpecBase {

  /** Walk through AQE wrappers: AdaptiveSparkPlanExec and the
    * QueryStage nodes are leaves whose real plan hangs off a field. */
  private def allScans(p: SparkPlan): Seq[FileSourceScanExec] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case _ => Nil
    }
    here ++ p.children.flatMap(allScans) ++ p.subqueries.flatMap(allScans)
  }

  test("fact scan carries a dynamicpruning partition filter and reads 3/12 partitions") {
    val df = Catalog.byName("q_partition_prune").fn(spark, sfDir)
    val rows = df.collect()
    assert(rows.map(_.getInt(0)).sorted === Array(1, 2, 3))

    val factScan = allScans(df.queryExecution.executedPlan)
      .find(_.metadata("Location").contains("graft_dpp_"))
      .getOrElse(fail(s"no partitioned fact scan in:\n${df.queryExecution.executedPlan}"))
    assert(factScan.partitionFilters.exists(_.toString.contains("dynamicpruning")),
      s"fact scan is not dynamically pruned: ${factScan.partitionFilters}")

    // runtime proof, not just plan shape: only the dim's 3 months of
    // files were read (the staged layout has 12 month partitions)
    val staged = RelationalQueries.monthPartitionedLineitem(spark, sfDir)
    val totalParts = staged.select("mon").distinct().count()
    assert(totalParts === 12)
    val readParts = factScan.metrics("numPartitions").value
    assert(readParts === 3, s"expected 3 of $totalParts partitions read, got $readParts")
  }
}
