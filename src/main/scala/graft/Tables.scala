package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access layer over the driver-generated parquet fixtures
  * (`/root/repo/TESTDATA.md`). Mirrors the reference's convention of
  * addressing staged datasets by `dir/table` path
  * (verizon_table_migration_Rakesh_filters.py:189,229): every read goes
  * through `spark.read.parquet`, so Catalyst's vectorized parquet scan,
  * filter pushdown and column pruning apply automatically.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects.
      // Read nanos as long, floor-divide to micros — identical to DuckDB's
      // epoch_us() view of the same column.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Register every fixture table as a temp view (for SQL-expressed
    * queries: grouping sets etc.). Idempotent per session. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n => apply(spark, dir, n).createOrReplaceTempView(n) }
}
