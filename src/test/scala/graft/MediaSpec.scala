package graft

import graft.multimodal._

/** Tests for the multimodal binary-column plumbing: the decode step is
  * a deterministic stub (no codecs in this container), everything else
  * — schema, Dataset plumbing, mapPartitions batching, frame sampling,
  * partition sizing — is real. */
class MediaSpec extends SparkSpecBase {

  private def media = Media.fromDocuments(spark, sfDir)

  test("fromDocuments: payload bytes round-trip the text") {
    val r = media.filter(_.media_id == 0L).head()
    assert(r.modality === "image")
    assert(new String(r.payload, "UTF-8").startsWith(
      new String(r.payload.take(10), "UTF-8")))
    assert(r.payload.nonEmpty)
  }

  test("decodeAll: deterministic features, one row per record") {
    val n = media.count()
    val feats = Media.decodeAll(media, FakeDecoder)
    assert(feats.count() === n)
    val f1 = feats.filter(_.media_id == 1L).head()
    val f2 = Media.decodeAll(media, FakeDecoder).filter(_.media_id == 1L).head()
    assert(f1.checksum === f2.checksum)
    assert(f1.width >= 1 && f1.width <= 640)
    assert(f1.height >= 1 && f1.height <= 480)
    assert(f1.feature.length === 8)
    assert(f1.n_bytes > 0)
  }

  test("modality drives duration: images have none") {
    val feats = Media.decodeAll(media, FakeDecoder)
    assert(feats.filter(f => f.modality == "image" && f.duration_ms != 0L).count() === 0)
    assert(feats.filter(f => f.modality != "image" && f.duration_ms > 0L).count() > 0)
  }

  test("sampleFrames: stride-samples fixed-size chunks") {
    val one = media.filter(_.media_id == 2L)
    val payloadLen = one.head().payload.length
    val frames = Media.sampleFrames(one, frameBytes = 50, stride = 2).collect()
    val totalChunks = (payloadLen + 49) / 50
    val expected = (totalChunks + 1) / 2
    assert(frames.length === expected)
    assert(frames.forall(_.payload.length <= 50))
    // ids encode (parent, frame index)
    assert(frames.map(_.media_id).toSet.size === frames.length)
  }

  test("repartitionForDecode sizes partitions by estimated bytes") {
    val ds = Media.repartitionForDecode(media, totalBytesEstimate = 10L * 256 * 1024 * 1024)
    assert(ds.rdd.getNumPartitions === 10)
    val one = Media.repartitionForDecode(media, totalBytesEstimate = 1024)
    assert(one.rdd.getNumPartitions === 1)
  }
}
