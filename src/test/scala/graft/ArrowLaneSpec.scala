package graft

import graft.multimodal.{ArrowDecode, FakeDecoder, Media}
import org.apache.spark.sql.functions._

/** The Arrow-vectorized decode lane must agree with the row lane
  * exactly, across batch boundaries and partitions. */
class ArrowLaneSpec extends SparkSpecBase {

  private def canon(df: org.apache.spark.sql.DataFrame) = df
    .select("media_id", "modality", "n_bytes", "width", "height",
      "duration_ms", "checksum")
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3),
      r.getInt(4), r.getLong(5), r.getLong(6)))
    .sortBy(_._1).toSeq

  test("arrow lane equals the row lane on the fixture") {
    val media = Media.fromDocuments(spark, sfDir)
    val rowLane = canon(Media.decodeAll(media, FakeDecoder).toDF())
    val arrowLane = canon(ArrowDecode.decode(media.toDF()))
    assert(arrowLane.nonEmpty)
    assert(arrowLane === rowLane)
  }

  test("small batches: every batch boundary still decodes correctly") {
    val media = Media.fromDocuments(spark, sfDir).toDF().repartition(3)
    val rowLane = canon(Media.decodeAll(
      Media.fromDocuments(spark, sfDir), FakeDecoder).toDF())
    // 7-row batches force many partial batches per partition
    val arrowLane = canon(ArrowDecode.decode(media, maxRecordsPerBatch = 7))
    assert(arrowLane === rowLane)
  }

  test("feature vectors equal the row lane bitwise and feed vector ops") {
    import spark.implicits._
    val media = Media.fromDocuments(spark, sfDir)
    val rowFeats = Media.decodeAll(media, FakeDecoder).toDF()
      .select(col("media_id"), col("feature"))
      .as[(Long, Seq[Float])].collect().toMap
    val arrow = ArrowDecode.decodeWithFeatures(media.toDF(), maxRecordsPerBatch = 11)
    val arrowFeats = arrow.select(col("media_id"), col("feature"))
      .as[(Long, Seq[Float])].collect().toMap
    assert(arrowFeats.nonEmpty && arrowFeats === rowFeats)
    // the decode stage output plugs straight into the vector surface
    val probe = array((0 until 8).map(i => lit(0.1 * i)): _*)
    val sims = arrow
      .select(col("media_id"),
        graft.functions.GraftFunctions.cosine(
          col("feature").cast("array<double>"), probe).as("cos"))
      .where(col("cos").isNotNull)
    assert(sims.count() === arrowFeats.size)
  }

  test("feature lane wire format is FixedSizeList(8)<float32>") {
    // the point of the lane: fixed stride, no offsets buffer — the
    // layout a native ANN kernel or model runtime consumes zero-copy
    val f = ArrowDecode.featureArrowSchema("UTC").findField("feature")
    val t = f.getType.asInstanceOf[
      org.apache.arrow.vector.types.pojo.ArrowType.FixedSizeList]
    assert(t.getListSize === 8)
    val elem = f.getChildren.get(0)
    assert(elem.getType.isInstanceOf[
      org.apache.arrow.vector.types.pojo.ArrowType.FloatingPoint])
    assert(!elem.isNullable)
  }

  test("the lane preserves binary payloads exactly (checksum spot check)") {
    import spark.implicits._
    val df = Seq(
      (1L, "image", Array[Byte](0, 1, 2, 127, -128, -1)),
      (2L, "audio", Array[Byte]()),
      (3L, "video", Array.tabulate[Byte](1000)(i => (i % 251).toByte)))
      .toDF("media_id", "modality", "payload")
    val got = ArrowDecode.decode(df).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("checksum")).toMap
    def fnv(bytes: Array[Byte]): Long = {
      var h = 2166136261L
      bytes.foreach(b => h = ((h ^ (b & 0xffL)) * 16777619L) & 0xffffffffL)
      h
    }
    assert(got(1L) === fnv(Array[Byte](0, 1, 2, 127, -128, -1)))
    assert(got(2L) === fnv(Array.empty))
    assert(got(3L) === fnv(Array.tabulate[Byte](1000)(i => (i % 251).toByte)))
  }
}
