package org.apache.spark.sql.graftshim

import java.io.ByteArrayInputStream
import java.nio.channels.Channels

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.BufferAllocator
import org.apache.arrow.vector.{VectorLoader, VectorSchemaRoot}
import org.apache.arrow.vector.complex.FixedSizeListVector
import org.apache.arrow.vector.ipc.ReadChannel
import org.apache.arrow.vector.ipc.message.MessageSerializer
import org.apache.arrow.vector.types.pojo.{Schema => ArrowSchema}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.arrow.ArrowConverters
import org.apache.spark.sql.types.{ArrayType, StructType}
import org.apache.spark.sql.util.ArrowUtils
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnVector, ColumnarArray, ColumnarBatch, ColumnarMap}

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

  /** Like [[mapArrowBatches]], but the OUTPUT batches use an explicit
    * Arrow schema that need not be the default Spark mapping — the
    * case that matters here is FixedSizeList vectors (a fixed-width
    * embedding column: no offsets buffer, constant stride — the layout
    * a native ANN kernel or model runtime consumes zero-copy), which
    * Spark's own `fromBatchIterator`/`ArrowColumnVector` cannot load
    * (no FixedSizeList accessor as of 4.1.2). `arrowOut` must be
    * row-compatible with `outSchema` (same field order; fixed-size
    * lists surface as ArrayType). */
  def mapArrowBatchesTo(
      df: DataFrame,
      outSchema: StructType,
      arrowOut: ArrowSchema,
      maxRecordsPerBatch: Int)(
      f: Array[Byte] => Iterator[Array[Byte]]): DataFrame = {
    val classic = df.asInstanceOf[ClassicDataset[Row]]
    val spark = classic.sparkSession
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val inSchema = classic.schema
    val maxRecords = maxRecordsPerBatch.toLong
    // pojo.Schema is not java-serializable — ship its JSON form
    val arrowOutJson = arrowOut.toJson
    val rdd = classic.queryExecution.toRdd.mapPartitions { it =>
      val ctx = TaskContext.get()
      val in = ArrowConverters.toBatchIterator(
        it, inSchema, maxRecords, tz, true, false, ctx)
      val alloc = newAllocator("graft-arrow-lane-out")
      val root = VectorSchemaRoot.create(ArrowSchema.fromJSON(arrowOutJson), alloc)
      val vectors: Array[ColumnVector] = root.getFieldVectors.asScala.map {
        case fsl: FixedSizeListVector => new FixedSizeListColumnVector(fsl)
        case v => new ArrowColumnVector(v): ColumnVector
      }.toArray
      if (ctx != null)
        ctx.addTaskCompletionListener[Unit](_ => { root.close(); alloc.close() })
      // one root per partition, reloaded per batch — rows are views
      // into the current batch, the same lifecycle contract as Spark's
      // own ArrowConverters.fromBatchIterator
      in.flatMap(f).flatMap { bytes =>
        val rb = MessageSerializer.deserializeRecordBatch(
          new ReadChannel(Channels.newChannel(new ByteArrayInputStream(bytes))),
          alloc)
        try new VectorLoader(root).load(rb) finally rb.close()
        new ColumnarBatch(vectors, root.getRowCount).rowIterator().asScala
      }
    }
    spark.internalCreateDataFrame(rdd, outSchema, isStreaming = false)
  }

  /** Arrow schema for a batch function's (de)serialization side. */
  def toArrowSchema(schema: StructType, timeZoneId: String): ArrowSchema =
    ArrowUtils.toArrowSchema(schema, timeZoneId,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false)

  /** Spark type for an Arrow field (FixedSizeList → ArrayType). */
  def fromArrowField(field: org.apache.arrow.vector.types.pojo.Field) =
    ArrowUtils.fromArrowField(field)

  /** Child allocator off Spark's shared root (caller closes). */
  def newAllocator(name: String): BufferAllocator =
    ArrowUtils.rootAllocator.newChildAllocator(name, 0, Long.MaxValue)
}

/** ColumnVector view over an Arrow FixedSizeListVector — the accessor
  * Spark's ArrowColumnVector is missing. Elements sit in the child
  * data vector at a constant stride, so `getArray` is pure offset
  * arithmetic (no offsets buffer). */
final class FixedSizeListColumnVector(v: FixedSizeListVector)
    // element type via the child field — ArrowUtils.fromArrowField does
    // not map the FixedSizeList ArrowType itself
    extends ColumnVector(ArrayType(
      ArrowUtils.fromArrowField(v.getDataVector.getField),
      v.getDataVector.getField.isNullable)) {
  private val child = new ArrowColumnVector(v.getDataVector)
  private val listSize = v.getListSize
  override def hasNull: Boolean = v.getNullCount > 0
  override def numNulls: Int = v.getNullCount
  override def isNullAt(i: Int): Boolean = v.isNull(i)
  override def getArray(i: Int): ColumnarArray =
    new ColumnarArray(child, i * listSize, listSize)
  override def close(): Unit = child.close()
  private def unsupported = throw new UnsupportedOperationException(
    "FixedSizeListColumnVector holds arrays")
  override def getBoolean(i: Int): Boolean = unsupported
  override def getByte(i: Int): Byte = unsupported
  override def getShort(i: Int): Short = unsupported
  override def getInt(i: Int): Int = unsupported
  override def getLong(i: Int): Long = unsupported
  override def getFloat(i: Int): Float = unsupported
  override def getDouble(i: Int): Double = unsupported
  override def getMap(i: Int): ColumnarMap = unsupported
  override def getDecimal(i: Int, precision: Int, scale: Int) = unsupported
  override def getUTF8String(i: Int) = unsupported
  override def getBinary(i: Int) = unsupported
  override def getChild(i: Int): ColumnVector = unsupported
}
