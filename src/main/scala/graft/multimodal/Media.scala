package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension): image/audio/video
  * payloads modeled as opaque `binary` columns plus typed metadata,
  * processed in partition-sized batches. The actual codec step is
  * STUBBED (no image/audio libraries in this container) behind
  * [[MediaDecoder]] with a deterministic fake, but everything Spark-side
  * is real: the schema, the typed Dataset plumbing, the mapPartitions
  * batch shape, and the partition sizing ahead of the decode stage.
  *
  * At 100 TB the decode stage is the expensive part, so the contract is:
  *  - payloads stay opaque bytes end-to-end (no driver collect);
  *  - decode runs once per partition iterator (mapPartitions), letting
  *    an implementation amortize codec/model initialization;
  *  - `repartitionForDecode` right-sizes partitions by estimated bytes
  *    so one decode task fits executor memory.
  */
final case class MediaRecord(
    media_id: Long,
    modality: String, // "image" | "audio" | "video"
    payload: Array[Byte],
    source: String)

final case class MediaFeatures(
    media_id: Long,
    modality: String,
    n_bytes: Long,
    // decode outputs (fake-deterministic in this container):
    width: Int, height: Int, duration_ms: Long,
    checksum: Long,
    feature: Array[Float])

/** The stubbed codec boundary. A real deployment plugs in JNI/FFmpeg/
  * image codecs here; the engine only relies on the interface. */
trait MediaDecoder extends Serializable {
  def decode(r: MediaRecord): MediaFeatures
}

/** Deterministic fake decoder: all outputs are pure functions of the
  * payload bytes, so tests and cross-engine oracles are stable. */
object FakeDecoder extends MediaDecoder {
  override def decode(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    var h = 2166136261L // FNV-1a 32-bit, kept in a Long
    var i = 0
    while (i < bytes.length) {
      h = ((h ^ (bytes(i) & 0xffL)) * 16777619L) & 0xffffffffL
      i += 1
    }
    val feat = Array.tabulate(8) { k =>
      (((h >> (k * 4)) & 0xff).toFloat / 255.0f) - 0.5f
    }
    MediaFeatures(
      media_id = r.media_id,
      modality = r.modality,
      n_bytes = bytes.length.toLong,
      width = (h % 640).toInt + 1,
      height = ((h >> 8) % 480).toInt + 1,
      duration_ms = if (r.modality == "image") 0L else (h % 60000L) + 1L,
      checksum = h,
      feature = feat)
  }
}

object Media {

  /** Partition sizing before the decode stage: target bytes per task so
    * one partition's payloads fit comfortably in executor memory. */
  def repartitionForDecode(
      ds: Dataset[MediaRecord],
      totalBytesEstimate: Long,
      targetBytesPerTask: Long = 256L * 1024 * 1024): Dataset[MediaRecord] = {
    val parts = math.max(1, (totalBytesEstimate / targetBytesPerTask).toInt)
    ds.repartition(parts)
  }

  /** The decode stage: one decoder instance per partition iterator —
    * this is where a real codec would amortize its init cost. */
  def decodeAll(ds: Dataset[MediaRecord], decoder: MediaDecoder): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(it => it.map(decoder.decode))
  }

  /** Frame sampling for video-like payloads: emit every `stride`-th
    * chunk of `frameBytes` as its own record (payload stays bytes). */
  def sampleFrames(
      ds: Dataset[MediaRecord], frameBytes: Int, stride: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, idx) if idx % stride == 0 =>
          r.copy(media_id = r.media_id * 1000 + idx, payload = chunk)
      }
    })
  }

  /** Fixture adapter: derive a deterministic media table from the
    * `documents` fixture (text bytes as payload) — the container has no
    * binary fixture, so the plumbing is exercised on synthetic bytes. */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source").as("source"))
      .as[MediaRecord]
  }
}
