package graft.streaming

import graft.pipeline.Storage
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exactly-once foreachBatch sink — streaming parity with the batch
  * pipeline's per-file checkpoint-marker contract
  * (`pipeline/Storage.scala` C2–C4 + `IdempotentParquetSink`; the
  * batch side models the reference's checkpoint loop,
  * verizon_table_migration_Rakesh_filters.py:237-276).
  *
  * Per micro-batch:
  *  1. marker exists → the batch was FULLY committed by an earlier
  *     attempt whose streaming checkpoint never advanced (crash in
  *     the write→checkpoint window) — skip, writing nothing;
  *  2. no marker → OVERWRITE `target/batch=<id>`. A crash mid-write
  *     leaves partial files but no marker, so the replay lands as an
  *     overwrite of the same directory instead of an append next to
  *     the orphans;
  *  3. create the zero-byte marker (the commit point).
  *
  * Structured Streaming's contract makes this exactly-once: with a
  * checkpointLocation, a batch id is re-delivered with the SAME data
  * after any crash, so the marker collapses at-least-once delivery to
  * exactly-once storage. Readers take only marker-committed batch
  * directories ([[read]]), so even a torn batch dir (case 2, before
  * its replay) is invisible downstream.
  *
  * Scale: the marker probe + create are two filesystem metadata ops
  * per micro-batch (driver-side, no data scan); the data write is the
  * same distributed parquet write the naive sink does.
  */
final case class ExactlyOnceBatchSink(target: String, markerDir: String) {

  private def storage(df: DataFrame) =
    new Storage(df.sparkSession.sparkContext.hadoopConfiguration)

  private def name(batchId: Long) = s"batch-$batchId"

  def batchDir(batchId: Long): String = s"$target/batch=$batchId"

  /** The foreachBatch body. Returns true iff this call wrote. */
  def writeBatch(df: DataFrame, batchId: Long): Boolean = {
    val st = storage(df)
    if (st.checkpointExists(markerDir, name(batchId))) false
    else {
      df.write.mode("overwrite").parquet(batchDir(batchId))
      st.createCheckpoint(markerDir, name(batchId))
      true
    }
  }

  /** Curried form matching `DataStreamWriter.foreachBatch`. */
  def foreachBatchFn: (DataFrame, Long) => Unit =
    (df, id) => { writeBatch(df, id); () }

  /** Committed batch ids (marker-backed), sorted. */
  def committedBatches(spark: SparkSession): Seq[Long] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(markerDir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else fs.globStatus(new org.apache.hadoop.fs.Path(p, "batch-*.checkpoint"))
      .map(_.getPath.getName.stripPrefix("batch-").stripSuffix(".checkpoint").toLong)
      .sorted.toSeq
  }

  /** Read ONLY marker-committed batches — torn (uncommitted) batch
    * directories never reach a consumer. */
  def read(spark: SparkSession): DataFrame =
    readKeepingBatch(spark).drop("batch")

  /** [[read]] keeping the `batch` partition id: update-mode state
    * machines re-emit a key's current answer every batch it appears
    * in, so "the latest emission per key" — the machine's final
    * answer — selects on max(batch) per key. */
  def readKeepingBatch(spark: SparkSession): DataFrame = {
    val ids = committedBatches(spark)
    require(ids.nonEmpty, s"no committed batches under $markerDir")
    spark.read.option("basePath", target)
      .parquet(ids.map(batchDir): _*)
  }
}
