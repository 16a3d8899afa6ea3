package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Adds `out` = exact global 1-based row_number of `order` to `df`.
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
      .select(sNames.map(col) :+ col("__srk_off"): _*)
    local.join(broadcast(offs), sNames)
      .withColumn(out, col("__srk_lrn") + col("__srk_off"))
      .drop(sNames ++ Seq("__srk_lrn", "__srk_off"): _*)
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
