package graft.queries

import graft.{QueryDef, Tables}
import graft.multimodal.{FakeDecoder, Media}
import org.apache.spark.sql.functions._

/** Multimodal binary-column queries (north-star extension). The
  * SQL-oracled entry checks the binary plumbing Spark-side against
  * DuckDB (byte lengths, hex heads, md5 fingerprints over the same
  * payload bytes); the decode-stage entry exercises the full
  * mapPartitions pipeline with the deterministic fake decoder (no SQL
  * twin — the decoder is engine-local — so the driver records a
  * rows-only check).
  */
object MultimodalQueries {

  /** Shared by the row lane and the Arrow lane — both decode stages
    * must produce exactly this. */
  private val decodeOracle =
    """WITH f AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |         WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
      |    octet_length(encode(text)) AS n_bytes,
      |    list_reduce(list_prepend(CAST(2166136261 AS BIGINT),
      |      list_transform(range(1, length(text)+1),
      |        i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
      |      (h, b) -> (xor(h, b) * 16777619) % 4294967296) AS h
      |  FROM documents)
      |SELECT doc_id AS media_id, modality, n_bytes,
      |  CAST(h % 640 + 1 AS INT) AS width,
      |  CAST((h // 256) % 480 + 1 AS INT) AS height,
      |  CASE WHEN modality = 'image' THEN 0 ELSE h % 60000 + 1 END AS duration_ms,
      |  h AS checksum
      |FROM f""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- binary column plumbing, oracle-checked ----
    QueryDef("q_multimodal_meta", Some(
      """SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |       WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  octet_length(encode(text)) AS n_bytes,
        |  upper(hex(encode(substr(text, 1, 8)))) AS head_hex,
        |  md5(text) AS content_md5
        |FROM documents""".stripMargin))(
      (s, d) =>
        Tables(s, d, "documents").select(
          col("doc_id").as("media_id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
          octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
          upper(hex(encode(substring(col("text"), 1, 8), "UTF-8"))).as("head_hex"),
          md5(col("text")).as("content_md5"))),

    // ---- full decode pipeline (mapPartitions, stubbed codec). Even
    // the stub is oracle-gated: FakeDecoder's FNV-1a over the payload
    // bytes is pure integer arithmetic, replicated in the DuckDB twin
    // as a fold over character codes (ASCII corpus ⇒ bytes). ----
    QueryDef("q_multimodal_decode", Some(decodeOracle))(
      (s, d) => {
        val media = Media.fromDocuments(s, d)
        Media.decodeAll(media, FakeDecoder)
          .toDF()
          .select(col("media_id"), col("modality"), col("n_bytes"),
            col("width"), col("height"), col("duration_ms"), col("checksum"))
      }),

    // ---- the same decode through the Arrow-vectorized lane
    // (mapInArrow-shaped batches; see graft.multimodal.ArrowDecode).
    // Same oracle as the row lane — the two stages must agree byte
    // for byte. ----
    QueryDef("q_multimodal_decode_arrow", Some(decodeOracle))(
      (s, d) =>
        graft.multimodal.ArrowDecode.decode(Media.fromDocuments(s, d).toDF()))
  )
}
