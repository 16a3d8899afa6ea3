package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Kafka-shaped source adapter on files (SURVEY.md §2.4 streaming
  * extension): a keyed, partitioned, offset-ordered append log.
  *
  *  - rows hash by key into a fixed number of log partitions
  *    (`__p = pmod(xxhash64(key), n)` — same stable-key contract as a
  *    Kafka partitioner);
  *  - each append assigns dense per-partition offsets continuing from
  *    the log's current end offsets, ordered by caller-provided
  *    columns (offset assignment must be deterministic — replays of
  *    the same data produce the same ledger);
  *  - consumers either replay a batch FROM given offsets (the
  *    `seek`/rewind path) or tail the log as a structured stream.
  *
  * The offset column IS the ledger: end offsets are recovered from the
  * data itself (columnar max per partition — an offset-column-only
  * scan), so there is no side metadata to corrupt. Scale notes: one
  * append = one shuffle (the per-partition row_number); consumers
  * prune by `__p` (storage-partitioned layout) and filter offsets
  * below the parquet row-group min/max.
  */
object KeyedLog {

  /** Append rows to the log, assigning partition + dense offsets.
    * Returns the new end offsets per partition. */
  def append(df: DataFrame, dir: String, keyCol: String,
      numPartitions: Int, orderBy: Seq[Column]): Map[Int, Long] = {
    require(orderBy.nonEmpty, "deterministic offset order requires orderBy columns")
    val spark = df.sparkSession
    val ends = endOffsets(spark, dir, df.schema, numPartitions)
    val endsExpr = ends.foldLeft(lit(0L)) { case (acc, (p, off)) =>
      when(col("__p") === p, off).otherwise(acc)
    }
    val w = Window.partitionBy(col("__p")).orderBy(orderBy: _*)
    df.withColumn("__p", pmod(xxhash64(col(keyCol)), lit(numPartitions.toLong)).cast("int"))
      .withColumn("offset", row_number().over(w) - 1 + endsExpr)
      .write.mode("append").partitionBy("__p").parquet(dir)
    endOffsets(spark, dir, df.schema, numPartitions)
  }

  /** Current end offset (next offset to assign) per partition. */
  def endOffsets(spark: SparkSession, dir: String, dataSchema: StructType,
      numPartitions: Int): Map[Int, Long] = {
    val base = (0 until numPartitions).map(_ -> 0L).toMap
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir))) base
    else {
      val observed = spark.read.parquet(dir)
        .groupBy(col("__p")).agg(max(col("offset")).as("mx"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1) + 1L)).toMap
      base ++ observed
    }
  }

  /** Batch replay from the given offsets (inclusive); partitions not
    * in the map replay from 0. The `__p` filter prunes storage
    * partitions; the offset filter prunes row groups via min/max. */
  def readBatch(spark: SparkSession, dir: String,
      fromOffsets: Map[Int, Long] = Map.empty): DataFrame = {
    val df = spark.read.parquet(dir)
    if (fromOffsets.isEmpty) df
    else {
      val fromExpr = fromOffsets.foldLeft(lit(0L)) { case (acc, (p, off)) =>
        when(col("__p") === p, off).otherwise(acc)
      }
      df.where(col("offset") >= fromExpr)
    }
  }

  /** Tail the log as a stream: segment files are consumed in bounded
    * per-trigger batches (the file source tracks consumed files in its
    * checkpoint — the consumer-group offset equivalent). */
  def readStream(spark: SparkSession, dir: String, dataSchema: StructType,
      maxFilesPerTrigger: Int = 4): DataFrame = {
    // declared schema must carry the partition-dir column (__p) and
    // the ledger column for the file source to surface them
    val full = new StructType(
      (dataSchema.fields :+
        org.apache.spark.sql.types.StructField("offset",
          org.apache.spark.sql.types.LongType, nullable = false) :+
        org.apache.spark.sql.types.StructField("__p",
          org.apache.spark.sql.types.IntegerType, nullable = false)).toArray)
    spark.readStream
      .schema(full)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
  }
}
