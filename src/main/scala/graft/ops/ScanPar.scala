package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Parallelism floor for compute-heavy subtrees over low-parallelism
  * scans (optimization guide §2.5, "input skew": one huge unsplittable
  * file — a single-row-group parquet file behaves the same way, every
  * byte split except the one holding the row group midpoint is empty —
  * "fix at the source if you can; otherwise repartition immediately
  * after the read").
  *
  * `ensure` inserts one hash exchange on `keys` ONLY when the subtree's
  * physical scan yields materially fewer partitions than the session's
  * default parallelism, so expensive per-row work downstream (tokenize →
  * shingle-hash, vector arithmetic, decimal folds) spreads over the
  * machine instead of running serially inside the scan task. The
  * condition is derived from the actual planned split count, not a
  * constant: at cluster scale any real table carries orders of magnitude
  * more splits than cores and the call is the identity — no exchange is
  * added, exactly as guide §2.3/§2.4 demand. Keyed (not round-robin)
  * repartitioning keeps the exchange deterministic under task retry
  * (guide §2.5, SPARK-38388) and skips the local sort a keyless
  * `repartition(n)` pays (`spark.sql.execution.sortBeforeRepartition`).
  */
object ScanPar {

  /** Partition count the physical plan would give `df` right now
    * (file-split count for a scan subtree; no job is run). */
  private def plannedPartitions(df: DataFrame): Int =
    df.queryExecution.toRdd.getNumPartitions

  /** Repartition `df` by `keys` to the default parallelism iff its
    * planned scan parallelism is below half of it; identity otherwise
    * (and always the identity on well-laid-out cluster-scale inputs). */
  def ensure(spark: SparkSession, df: DataFrame, keys: Column*): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (plannedPartitions(df) * 2 <= target) df.repartition(target, keys: _*)
    else df
  }

  /** Persist + build the cache NOW with one parallel pass. A lazily
    * persisted frame consumed by several branches of the same job makes
    * every branch's tasks race the cache build and serialize on the
    * per-block cache locks (the lock wait is charged to task run time —
    * measured 10+ CPU-s of wait on a 0.5 CPU-s build in the shingle
    * self-joins). One eager count() materializes each partition exactly
    * once; every downstream consumer then reads finished blocks.
    * Lineage is kept (unlike localCheckpoint), so an executor loss
    * still recomputes at cluster scale. */
  def eager(df: DataFrame): DataFrame = {
    val p = df.persist()
    p.count()
    p
  }
}
