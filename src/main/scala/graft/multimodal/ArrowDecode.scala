package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.channels.Channels
import java.nio.charset.StandardCharsets

import org.apache.arrow.memory.BufferAllocator
import org.apache.arrow.vector.{BigIntVector, IntVector, VarBinaryVector, VarCharVector, VectorLoader, VectorSchemaRoot, VectorUnloader}
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.{ReadChannel, WriteChannel}
import org.apache.arrow.vector.ipc.message.{ArrowRecordBatch, MessageSerializer}
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

  /** media must have (media_id bigint, modality string, payload binary). */
  def decode(media: DataFrame, maxRecordsPerBatch: Int = 4096): DataFrame =
    run(media, outSchema, maxRecordsPerBatch, withFeature = false)

  /** Same stage emitting the feature vector column as an Arrow list —
    * the batch shape a real embedding model would fill. Float math is
    * identical to [[FakeDecoder]]'s, so the lanes agree bitwise. */
  def decodeWithFeatures(media: DataFrame, maxRecordsPerBatch: Int = 4096): DataFrame =
    run(media, featureSchema, maxRecordsPerBatch, withFeature = true)

  private def run(media: DataFrame, schema: StructType,
      maxRecordsPerBatch: Int, withFeature: Boolean): DataFrame = {
    val in = media.select("media_id", "modality", "payload")
    val inSchema = in.schema
    val tz = in.sparkSession.conf.get("spark.sql.session.timeZone")
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
        ArrowLane.toArrowSchema(outSchema, tz), alloc)
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
          outRoot.getVector("feature").asInstanceOf[ListVector] else null
        val fWriter = if (withFeature) oF.getWriter else null

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
            // same float math as FakeDecoder.decode's feature
            fWriter.setPosition(i)
            fWriter.startList()
            var k = 0
            while (k < 8) {
              fWriter.float4().writeFloat4(
                (((h >> (k * 4)) & 0xff).toFloat / 255.0f) - 0.5f)
              k += 1
            }
            fWriter.endList()
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
