package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Data-layout staging: range-cluster a dataset on its dominant filter
  * key before writing, so parquet min/max statistics actually prune.
  *
  * The reference stages every intermediate round-robin
  * (`repartition(n)`, py:196/216) — each output file then spans the
  * whole key domain, and a filtered re-read must open every row group.
  * Range-partition + sort-within-partition instead gives each file a
  * narrow, disjoint key range; a predicate on that key overlaps only
  * the files/row groups it actually needs, and both Spark's parquet
  * reader (row-group stats skip) and DuckDB (zone-map style) prune the
  * rest. At 100 TB this is the difference between a full-corpus scan
  * and reading ~1/n of it for every downstream slice — the same
  * motivation as Z-order clustering in lakehouse formats, done with
  * plain Spark operators for the 1-D (single dominant key) case.
  *
  * `LayoutSpec` proves the effect by metric: the scan's output rows
  * under an equality-band predicate drop to the matching stripe(s)
  * only, versus the whole table for round-robin staging.
  */
object Layout {

  /** Range-cluster `df` into `n` write tasks ordered by `keys`: files
    * get disjoint sorted key ranges (modulo range-sampling boundaries).
    * The sort is within partitions only — no global sort barrier
    * beyond the range exchange's reservoir sample. */
  def clusterByRange(df: DataFrame, n: Int, keys: String*): DataFrame =
    df.repartitionByRange(n, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)

  /** Cluster-and-stage: the layout-aware replacement for the
    * reference's `repartition(n).write.parquet(path)`. */
  def stageClustered(df: DataFrame, path: String, n: Int, keys: String*): Unit =
    clusterByRange(df, n, keys: _*).write.mode("overwrite").parquet(path)

  /** Expression-keyed variant (e.g. cluster a fact by `month(ts)`). */
  def clusterByRangeExpr(df: DataFrame, n: Int, keys: Column*): DataFrame =
    df.repartitionByRange(n, keys: _*).sortWithinPartitions(keys: _*)
}
