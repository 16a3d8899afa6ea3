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

  /** Z-order clustering over two keys: single-key range clustering
    * makes predicates on THAT key prune and leaves every other column
    * scattered across all files; interleaving the bits of both keys'
    * rank spaces gives a 1-D order in which file-sized runs stay local
    * in BOTH dimensions, so min/max stats prune for predicates on
    * either key (at ~sqrt the single-key selectivity each — the
    * standard curve trade-off).
    *
    * Ranks come from `percent_rank` scaled to `bits` bits (value
    * distribution independent — skewed domains still fill the curve
    * uniformly), and the interleave is a plain codegen'd shift/or
    * fold — no UDF. Two window passes (one sort per key) at write
    * time buy stat-based pruning on every later read; for a staged
    * dataset read many times that is the right side of the trade. The
    * windows are unpartitioned (a global sort each) — exact on any
    * skew, but the one piece that does not scale unbounded, which is
    * why the DEFAULT entry point ([[clusterZOrder]]) is the
    * shuffle-bounded uniform variant and this one is the explicit
    * opt-in for pathological key distributions. */
  def clusterZOrderRank(df: DataFrame, n: Int, keyA: String, keyB: String,
      bits: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{floor, lit, percent_rank, shiftleft, shiftright}
    val maxRank = (1L << bits) - 1
    def rank(key: String) =
      floor(percent_rank().over(Window.orderBy(col(key))) * maxRank).cast("long")
    val withRanks = df
      .withColumn("__ra", rank(keyA))
      .withColumn("__rb", rank(keyB))
    val z = (0 until bits).map { i =>
      val aBit = shiftleft(shiftright(col("__ra"), i).bitwiseAND(lit(1L)), 2 * i)
      val bBit = shiftleft(shiftright(col("__rb"), i).bitwiseAND(lit(1L)), 2 * i + 1)
      aBit.bitwiseOR(bBit)
    }.reduce(_.bitwiseOR(_))
    withRanks.withColumn("__z", z)
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__ra", "__rb", "__z")
  }

  /** Default z-order entry point: the shuffle-bounded uniform-bucket
    * variant — the plan that holds at cluster scale. Reach for
    * [[clusterZOrderRank]] only when a key's distribution is
    * pathological AND the dataset still sorts globally in acceptable
    * time. */
  def clusterZOrder(df: DataFrame, n: Int, keyA: String, keyB: String,
      bits: Int = 16): DataFrame =
    clusterZOrderUniform(df, n, keyA, keyB, bits)

  /** Z-order-and-stage, two-key twin of [[stageClustered]]. */
  def stageZOrdered(df: DataFrame, path: String, n: Int,
      keyA: String, keyB: String): Unit =
    clusterZOrder(df, n, keyA, keyB).write.mode("overwrite").parquet(path)

  /** Shuffle-bounded z-order: [[clusterZOrderRank]]'s rank windows are
    * global sorts — exact, but the one piece that does not scale
    * unbounded. This variant ranks each key with
    * `width_bucket(v, min, max, 2^bits)` off a single tiny min/max
    * aggregate, so the whole write is one metadata-sized job plus the
    * range exchange — the shape lakehouse z-order implementations use.
    * Trade: uniform value buckets, not frequency buckets; a heavily
    * skewed key fills its curve dimension unevenly (pruning degrades
    * toward single-key clustering on the other key, never below it).
    * Use the rank variant when a key's distribution is pathological
    * and the dataset still sorts globally in acceptable time. */
  def clusterZOrderUniform(df: DataFrame, n: Int, keyA: String, keyB: String,
      bits: Int = 16): DataFrame = {
    import org.apache.spark.sql.functions.{lit, max, min, shiftleft, shiftright, width_bucket}
    val buckets = 1L << bits
    val Array(loA, hiA, loB, hiB) = df.agg(
        min(col(keyA)).cast("double"), max(col(keyA)).cast("double"),
        min(col(keyB)).cast("double"), max(col(keyB)).cast("double"))
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    def rank(key: String, lo: Double, hi: Double) =
      // width_bucket is 1-based and gives hi the overflow bucket; clamp
      // back into [0, 2^bits)
      org.apache.spark.sql.functions.least(
        width_bucket(col(key).cast("double"), lit(lo), lit(hi), lit(buckets.toInt)) - 1,
        lit(buckets - 1)).cast("long")
    val withRanks = df
      .withColumn("__ra", rank(keyA, loA, hiA))
      .withColumn("__rb", rank(keyB, loB, hiB))
    val z = (0 until bits).map { i =>
      val aBit = shiftleft(shiftright(col("__ra"), i).bitwiseAND(lit(1L)), 2 * i)
      val bBit = shiftleft(shiftright(col("__rb"), i).bitwiseAND(lit(1L)), 2 * i + 1)
      aBit.bitwiseOR(bBit)
    }.reduce(_.bitwiseOR(_))
    withRanks.withColumn("__z", z)
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__ra", "__rb", "__z")
  }

  /** Compact a small-files directory: rewrite `srcDir`'s parquet as
    * ceil(rows / targetRows) right-sized files, preserving (or
    * establishing) a cluster key. The small-files problem is the
    * standard failure mode of incremental ingestion at scale — every
    * micro-batch/task leaves a file, listings and footer reads come to
    * dominate scan time, and row-group stats stop pruning because each
    * file is a sliver. One COUNT (parquet footers only — no data scan)
    * sizes the job; the rewrite is a single range exchange, so the
    * result is both compacted AND range-clustered for downstream
    * pruning. `maxRecordsPerFile` caps any straggler task's output, so
    * range-sampling skew costs at most a few extra files, never an
    * oversized one. Returns the file count written. */
  def compact(spark: org.apache.spark.sql.SparkSession, srcDir: String,
      dstDir: String, targetRows: Long, keys: String*): Int = {
    val df = spark.read.parquet(srcDir)
    val rows = df.count() // metadata-only under the parquet footer path
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRows).toInt)
    val clustered =
      if (keys.nonEmpty) clusterByRange(df, nFiles, keys: _*)
      else df.repartition(nFiles)
    clustered.write.mode("overwrite")
      .option("maxRecordsPerFile", targetRows)
      .parquet(dstDir)
    val p = new org.apache.hadoop.fs.Path(dstDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(s => s.getPath.getName.endsWith(".parquet"))
  }
}
