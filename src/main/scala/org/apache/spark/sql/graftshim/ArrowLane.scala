package org.apache.spark.sql.graftshim

import org.apache.arrow.memory.BufferAllocator
import org.apache.arrow.vector.types.pojo.{Schema => ArrowSchema}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.arrow.ArrowConverters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.ArrowUtils

/** Scala-side equivalent of PySpark's `mapInArrow`: run a
  * batch-of-Arrow-bytes → batch-of-Arrow-bytes function over every
  * partition of a DataFrame. Spark only exposes its Arrow
  * serialization machinery `private[sql]` (it exists for the Python
  * runner), so this one-file bridge lives under `org.apache.spark.sql`
  * to re-export the three pieces the engine needs; everything else
  * stays in graft packages. The bridge adds no behavior of its own.
  *
  * Each element handed to `f` is one serialized Arrow RecordBatch
  * message (same wire format the PySpark worker receives), capped at
  * `maxRecordsPerBatch` rows — so a real deployment can forward the
  * bytes zero-copy to a native/Python codec worker and feed its
  * replies straight back.
  */
object ArrowLane {

  def mapArrowBatches(
      df: DataFrame,
      outSchema: StructType,
      maxRecordsPerBatch: Int)(
      f: Array[Byte] => Iterator[Array[Byte]]): DataFrame = {
    val classic = df.asInstanceOf[ClassicDataset[Row]]
    val spark = classic.sparkSession
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val inSchema = classic.schema
    val maxRecords = maxRecordsPerBatch.toLong
    val rdd = classic.queryExecution.toRdd.mapPartitions { it =>
      val ctx = TaskContext.get()
      val in = ArrowConverters.toBatchIterator(
        it, inSchema, maxRecords, tz,
        true /* errorOnDuplicatedFieldNames */, false /* largeVarTypes */,
        ctx)
      ArrowConverters.fromBatchIterator(in.flatMap(f), outSchema, tz,
        true, false, ctx)
    }
    spark.internalCreateDataFrame(rdd, outSchema, isStreaming = false)
  }

  /** Arrow schema for a batch function's (de)serialization side. */
  def toArrowSchema(schema: StructType, timeZoneId: String): ArrowSchema =
    ArrowUtils.toArrowSchema(schema, timeZoneId,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false)

  /** Child allocator off Spark's shared root (caller closes). */
  def newAllocator(name: String): BufferAllocator =
    ArrowUtils.rootAllocator.newChildAllocator(name, 0, Long.MaxValue)
}
