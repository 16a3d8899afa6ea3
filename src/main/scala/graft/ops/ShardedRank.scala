package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranks without a single-partition sort.
  *
  * `WindowExec` plans any `OVER (ORDER BY …)` with no PARTITION BY as ONE
  * task holding the whole input — the silent scale-killer behind
  * `ntile()`/`row_number()` over a total order. This helper computes the
  * identical global `row_number` with the two-phase sharded-rank pattern
  * used across the catalog (epoch shuffle, concurrency sweep, export
  * batching): a LOCAL rank per shard (parallel, one hash shuffle) plus a
  * broadcast per-shard row-count offset, where the shard key is
  * (non-strictly) monotone in the requested order. The only unpartitioned
  * window left runs over the per-shard AGGREGATE — |shards| rows, bounded
  * by construction, never the corpus.
  *
  * Choosing shards: the shard tuple must be a prefix-monotone refinement
  * of the sort order — each component either equals the corresponding
  * sort key exactly (then further components may sub-shard its tie
  * classes, e.g. `user_id DIV 16384`), or is a coarsening (value band)
  * of a FINE-GRAINED final key whose tie classes then stay within one
  * shard. Low-cardinality keys with huge tie classes take the
  * (key, id-shard) composite; near-unique keys take a value band.
  */
object ShardedRank {

  /** Row-count threshold (per frame) below which [[rowNumberAdaptive]]
    * plans the plain single-partition window instead of the two-phase
    * sharded plan. A ≤2M-row sort is a few hundred MB in ONE task —
    * cheaper than three extra exchanges + a broadcast join-back — while
    * anything bigger is exactly the frame the sharded plan exists for. */
  val ThresholdConf = "spark.graft.shardedRank.threshold"
  val DefaultThreshold = 2000000L

  def threshold(spark: SparkSession): Long =
    spark.conf.getOption(ThresholdConf).map(_.toLong)
      .getOrElse(DefaultThreshold)

  /** Adds `out` = exact global 1-based row_number of `order` to `df`.
    *
    * NULL shard keys are supported (they form their own tie class, kept
    * via a null-safe join-back) and sort per Spark's default placement:
    * FIRST under an ascending shard flag, LAST under descending — the
    * same default `order` gets, so a null-keyed frame still ranks
    * consistently as long as `order` uses default null ordering too.
    *
    * @param shards    shard-key columns; the tuple must sort (under
    *                  `shardDesc`) consistently with `order`, and every
    *                  `order`-tie class must be contained in one shard
    * @param shardDesc per-shard-column descending flag (aligned)
    * @param order     within-shard sort — must total-order each shard
    */
  def rowNumber(df: DataFrame, shards: Seq[Column], shardDesc: Seq[Boolean],
      order: Seq[Column], out: String): DataFrame = {
    require(shards.nonEmpty && shards.size == shardDesc.size)
    val sNames = shards.indices.map(i => s"__srk_s$i")
    val oNames = shards.indices.map(i => s"__srk_o$i")
    val withS = shards.zip(sNames).foldLeft(df) {
      case (acc, (c, n)) => acc.withColumn(n, c)
    }
    val wLoc = Window.partitionBy(sNames.map(col): _*).orderBy(order: _*)
    val local = withS
      .withColumn("__srk_lrn", row_number().over(wLoc).cast("bigint"))
    val shardOrd = sNames.zip(shardDesc).map {
      case (n, true) => col(n).desc
      case (n, false) => col(n).asc
    }
    // |shards| rows only — the bounded frame the pattern exists for
    val wSh = BoundedWindow.ordered(shardOrd: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = withS.groupBy(sNames.map(col): _*)
      .agg(count(lit(1)).as("__srk_c"))
      .withColumn("__srk_off",
        coalesce(sum(col("__srk_c")).over(wSh), lit(0L)))
      .select(sNames.zip(oNames).map { case (s, o) => col(s).as(o) } :+
        col("__srk_off"): _*)
    // null-SAFE equi keys: a NULL shard key (possible when the key is
    // an aggregate, e.g. sum of an all-null column) groups into its own
    // window/groupBy class on both branches, but plain `=` would drop
    // its rows here — <=> keeps them. Spark plans EqualNullSafe as a
    // hash-join key, so this stays a broadcast hash join.
    val joinCond = sNames.zip(oNames)
      .map { case (s, o) => col(s) <=> col(o) }.reduce(_ && _)
    local.join(broadcast(offs), joinCond)
      .withColumn(out, col("__srk_lrn") + col("__srk_off"))
      .drop(sNames ++ oNames ++ Seq("__srk_lrn", "__srk_off"): _*)
  }

  /** The interactive-scale path: the plain global window, partitioned
    * by [[BoundedWindow]]'s constant fence so the single partition is
    * DECLARED bounded — callers use it only after measuring the frame
    * under [[threshold]], which is what makes the bound true. */
  def plainRowNumber(df: DataFrame, order: Seq[Column], out: String): DataFrame =
    df.withColumn(out,
      row_number().over(BoundedWindow.ordered(order: _*)).cast("bigint"))

  /** Size-adaptive exact global row_number: counts `df` (one cheap job —
    * callers hand a persisted or column-pruned frame), then plans the
    * plain bounded window at/below [[threshold]] and the two-phase
    * sharded plan above it. Returns the ranked frame AND the count so
    * callers feed `lit(n)` to [[ntileSql]] instead of re-aggregating.
    *
    * The sharded plan's 14.5× max-task win (SCALING.md) only matters
    * when the frame outgrows one task; below that its 3 extra
    * exchanges are pure overhead — measured 4× on q_events_rfm at
    * sf0.1. This keeps one code path correct at both ends. */
  def rowNumberAdaptive(df: DataFrame, shards: Seq[Column],
      shardDesc: Seq[Boolean], order: Seq[Column], out: String)
      : (DataFrame, Long) = {
    val n = df.count()
    val ranked =
      if (n <= threshold(df.sparkSession)) plainRowNumber(df, order, out)
      else rowNumber(df, shards, shardDesc, order, out)
    (ranked, n)
  }

  /** SQL-standard NTILE(b) from an exact global row_number `rn` and the
    * total row count `n` (both column names in scope): the first
    * n mod b buckets take ⌈n/b⌉ rows, the rest ⌊n/b⌋ — bit-identical to
    * the window function, as pure integer arithmetic. */
  def ntileSql(rn: String, n: String, b: Int): String = {
    val q = s"($n DIV $b)"
    val r = s"($n % $b)"
    s"CAST(CASE WHEN $rn <= $r * ($q + 1) THEN ($rn + $q) DIV ($q + 1)" +
      s" ELSE $r + ($rn - $r * ($q + 1) + $q - 1) DIV $q END AS BIGINT)"
  }
}
