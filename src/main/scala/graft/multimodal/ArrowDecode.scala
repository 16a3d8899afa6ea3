package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.channels.Channels
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.BufferAllocator
import org.apache.arrow.vector.{BigIntVector, Float4Vector, IntVector, VarBinaryVector, VarCharVector, VectorLoader, VectorSchemaRoot, VectorUnloader}
import org.apache.arrow.vector.complex.FixedSizeListVector
import org.apache.arrow.vector.ipc.{ReadChannel, WriteChannel}
import org.apache.arrow.vector.ipc.message.{ArrowRecordBatch, MessageSerializer}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftshim.ArrowLane
import org.apache.spark.sql.types._

/** Arrow-vectorized decode stage: the columnar twin of
  * [[Media.decodeAll]]'s row lane, built on [[ArrowLane.mapArrowBatches]]
  * (the Scala equivalent of `mapInArrow`). Payload bytes move through
  * the stage as Arrow VarBinary buffers in `maxRecordsPerBatch`-row
  * batches — exactly the shape a Python/native codec worker consumes —
  * and the stub codec ([[FakeDecoder]]'s FNV-1a arithmetic, reproduced
  * here over the raw Arrow buffers) stands where the real decoder
  * would. Output is a fresh Arrow batch per input batch, converted
  * back to rows by the lane. Byte-identical to the row lane, so the
  * same DuckDB oracle gates both (q_multimodal_decode_arrow).
  */
object ArrowDecode {

  val outSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** decode + the 8-dim feature vector (the embedding-extraction shape:
    * binary in, float vector out, ready for the ANN queries). */
  val featureSchema: StructType =
    outSchema.add(StructField("feature", ArrayType(FloatType, containsNull = false),
      nullable = false))

  val featureDim = 8

  /** The feature lane's WIRE schema: the vector column is an Arrow
    * FixedSizeList(8)<float32> — no offsets buffer, constant stride —
    * so a native ANN kernel / model runtime can consume the batch
    * zero-copy, and the ANN queries read it back without
    * re-marshalling (ArrowLane.mapArrowBatchesTo supplies the
    * FixedSizeList accessor Spark lacks). */
  def featureArrowSchema(tz: String): ArrowSchema = {
    val scalars = ArrowLane.toArrowSchema(outSchema, tz).getFields.asScala
    val elem = new Field("element",
      new FieldType(false,
        new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE), null),
      java.util.Collections.emptyList[Field]())
    val feat = new Field("feature",
      new FieldType(false, new ArrowType.FixedSizeList(featureDim), null),
      java.util.Collections.singletonList(elem))
    new ArrowSchema((scalars :+ feat).asJava)
  }

  /** media must have (media_id bigint, modality string, payload binary). */
  def decode(media: DataFrame, maxRecordsPerBatch: Int = 4096): DataFrame =
    run(media, outSchema, maxRecordsPerBatch, withFeature = false)

  /** Same stage emitting the feature vector as a FixedSizeList Arrow
    * column (see [[featureArrowSchema]]). Float math is identical to
    * [[FakeDecoder]]'s, so the lanes agree bitwise. */
  def decodeWithFeatures(media: DataFrame, maxRecordsPerBatch: Int = 4096): DataFrame =
    run(media, featureSchema, maxRecordsPerBatch, withFeature = true)

  private def run(media: DataFrame, schema: StructType,
      maxRecordsPerBatch: Int, withFeature: Boolean): DataFrame = {
    val in = media.select("media_id", "modality", "payload")
    val inSchema = in.schema
    val tz = in.sparkSession.conf.get("spark.sql.session.timeZone")
    if (withFeature)
      ArrowLane.mapArrowBatchesTo(in, schema, featureArrowSchema(tz), maxRecordsPerBatch)(
        bytes => Iterator.single(decodeOneBatch(bytes, inSchema, schema, withFeature, tz)))
    else
      ArrowLane.mapArrowBatches(in, schema, maxRecordsPerBatch)(
        bytes => Iterator.single(decodeOneBatch(bytes, inSchema, schema, withFeature, tz)))
  }

  private def decodeOneBatch(
      bytes: Array[Byte], inSchema: StructType, outSchema: StructType,
      withFeature: Boolean, tz: String): Array[Byte] = {
    val alloc = ArrowLane.newAllocator("graft-arrow-decode")
    try {
      val inRoot = VectorSchemaRoot.create(
        ArrowLane.toArrowSchema(inSchema, tz), alloc)
      val outRoot = VectorSchemaRoot.create(
        if (withFeature) featureArrowSchema(tz)
        else ArrowLane.toArrowSchema(outSchema, tz), alloc)
      try {
        val rb = deserializeBatch(bytes, alloc)
        try new VectorLoader(inRoot).load(rb) finally rb.close()
        val n = inRoot.getRowCount

        val id = inRoot.getVector("media_id").asInstanceOf[BigIntVector]
        val mod = inRoot.getVector("modality").asInstanceOf[VarCharVector]
        val payload = inRoot.getVector("payload").asInstanceOf[VarBinaryVector]

        outRoot.allocateNew()
        val oId = outRoot.getVector("media_id").asInstanceOf[BigIntVector]
        val oMod = outRoot.getVector("modality").asInstanceOf[VarCharVector]
        val oN = outRoot.getVector("n_bytes").asInstanceOf[BigIntVector]
        val oW = outRoot.getVector("width").asInstanceOf[IntVector]
        val oH = outRoot.getVector("height").asInstanceOf[IntVector]
        val oD = outRoot.getVector("duration_ms").asInstanceOf[BigIntVector]
        val oC = outRoot.getVector("checksum").asInstanceOf[BigIntVector]
        val oF = if (withFeature)
          outRoot.getVector("feature").asInstanceOf[FixedSizeListVector] else null
        val oFData = if (withFeature)
          oF.getDataVector.asInstanceOf[Float4Vector] else null

        var i = 0
        while (i < n) {
          val pb = payload.get(i)
          // FNV-1a 32-bit over the payload — keep identical to
          // FakeDecoder so both lanes share one oracle
          var h = 2166136261L
          var j = 0
          while (j < pb.length) {
            h = ((h ^ (pb(j) & 0xffL)) * 16777619L) & 0xffffffffL
            j += 1
          }
          val modBytes = mod.get(i)
          val isImage = new String(modBytes, StandardCharsets.UTF_8) == "image"
          oId.setSafe(i, id.get(i))
          oMod.setSafe(i, modBytes)
          oN.setSafe(i, pb.length.toLong)
          oW.setSafe(i, (h % 640).toInt + 1)
          oH.setSafe(i, ((h >> 8) % 480).toInt + 1)
          oD.setSafe(i, if (isImage) 0L else (h % 60000L) + 1L)
          oC.setSafe(i, h)
          if (withFeature) {
            // same float math as FakeDecoder.decode's feature; elements
            // land at constant stride i*dim+k — no offsets to maintain
            oF.setNotNull(i)
            var k = 0
            while (k < featureDim) {
              oFData.setSafe(i * featureDim + k,
                (((h >> (k * 4)) & 0xff).toFloat / 255.0f) - 0.5f)
              k += 1
            }
          }
          i += 1
        }
        outRoot.setRowCount(n)

        val orb = new VectorUnloader(outRoot).getRecordBatch
        try {
          val bos = new ByteArrayOutputStream()
          MessageSerializer.serialize(
            new WriteChannel(Channels.newChannel(bos)), orb)
          bos.toByteArray
        } finally orb.close()
      } finally { inRoot.close(); outRoot.close() }
    } finally alloc.close()
  }

  /** Mirror of the lane's serialization: one RecordBatch message. */
  private def deserializeBatch(
      bytes: Array[Byte], alloc: BufferAllocator): ArrowRecordBatch =
    MessageSerializer.deserializeRecordBatch(
      new ReadChannel(Channels.newChannel(new ByteArrayInputStream(bytes))),
      alloc)
}
