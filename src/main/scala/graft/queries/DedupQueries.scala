package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.TextOps
import graft.ops.TextOps._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication surface for a training-data pipeline (north-star
  * extension; absent in the reference — SURVEY.md §2.4): exact,
  * n-gram-Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design (the part that matters at 100 TB):
  *  - exact: a single hash-shuffle groupBy on the content hash.
  *  - ngram-jaccard: inverted-index equi-join on shingles (candidates
  *    share >=1 shingle) — never an all-pairs cartesian. The DuckDB
  *    oracle computes the same result the O(n²) way, which is only
  *    feasible because the gate runs at sf0.01.
  *  - minhash LSH: k=16 signature, 4 bands × 4 rows; candidates are
  *    band-bucket collisions (equi-join on the band key) verified with
  *    exact Jaccard — the standard near-dup pipeline at corpus scale.
  *  - simhash: 32-bit fingerprint; candidates collide on one of four
  *    8-bit bands (any pair at Hamming ≤ 1 shares ≥3 intact bands by
  *    pigeonhole, so banding loses nothing at the chosen threshold),
  *    then exact Hamming filters. The threshold is tight (≤1) because
  *    the small-vocab synthetic corpus gives near-identical term
  *    frequency vectors — and simhash IS a frequency-vector sketch —
  *    so looser thresholds match unrelated docs.
  *  - embedding: exact thresholded pairs at verify scale; the LSH
  *    variant (random-hyperplane signatures, banded) is the scale path.
  */
object DedupQueries {

  private val shingleN = 3
  private val jaccardThreshold = 0.6

  private def docShingles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), shingles(tokens(col("text")), shingleN).as("sh"))

  /** Shared oracle CTE: doc_id → distinct 3-gram shingle list. */
  private val shinglesCte =
    s"""WITH sh AS (
       |  SELECT doc_id, ${shinglesSql(s"w", shingleN)} AS sh
       |  FROM (SELECT doc_id, ${tokensSql("text")} AS w FROM documents)
       |)""".stripMargin

  private def jaccardSqlPair =
    s"CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))"

  val defs: Seq[QueryDef] = Seq(

    // ---- exact dedup: one shuffle on the content hash ----
    QueryDef("q_dedup_exact", Some(
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper,
        |  count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin))(
      (s, d) =>
        Tables(s, d, "documents")
          .groupBy(md5(col("text")).as("content_hash"))
          .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))),

    // ---- exact n-gram Jaccard via shingle inverted index ----
    QueryDef("q_dedup_ngram_jaccard", Some(
      s"""$shinglesCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, $jaccardSqlPair AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE $jaccardSqlPair >= $jaccardThreshold""".stripMargin),
      headline = true)(
      (s, d) => {
        val sh = docShingles(s, d)
        val ex = sh.select(col("doc_id"), size(col("sh")).as("sz"),
          explode(col("sh")).as("shingle"))
        val a = ex.alias("a"); val b = ex.alias("b")
        a.join(b, col("a.shingle") === col("b.shingle") &&
            col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("a.sz").as("sza"), col("b.sz").as("szb"))
          .agg(count(lit(1)).as("inter"))
          .withColumn("jaccard",
            col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
          .where(col("jaccard") >= jaccardThreshold)
          .select(col("doc_a"), col("doc_b"), col("jaccard"))
      }),

    // ---- MinHash + LSH banding, exact-Jaccard verified ----
    QueryDef("q_dedup_minhash_lsh", Some {
      val bandKeys = (0 until numBands).map { b =>
        s"(SELECT doc_id, $b AS band, array_to_string(sig[${b * bandRows + 1}:${(b + 1) * bandRows}], '_') AS key FROM sig)"
      }.mkString("\nUNION ALL\n")
      s"""$shinglesCte,
         |hs AS (SELECT doc_id, ${shingleHashesSql("sh")} AS h FROM sh),
         |sig AS (SELECT doc_id, ${minhashSigFromHashesSql("h")} AS sig FROM hs),
         |bands AS ($bandKeys),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
         |)
         |SELECT cand.da AS doc_a, cand.db AS doc_b, $jaccardSqlPair AS jaccard
         |FROM cand JOIN sh a ON a.doc_id = cand.da JOIN sh b ON b.doc_id = cand.db
         |WHERE $jaccardSqlPair >= $jaccardThreshold""".stripMargin
    }, headline = true)(
      (s, d) => {
        val sh = docShingles(s, d)
        val sig = sh.select(col("doc_id"), minhashSig(col("sh")).as("sig"))
        val bands = sig.select(col("doc_id"), posexplode(
          array((0 until numBands).map { b =>
            concat_ws("_", transform(
              slice(col("sig"), b * bandRows + 1, bandRows), x => x.cast("string")))
          }: _*)).as(Seq("band", "key")))
        val cand = bands.alias("x")
          .join(bands.alias("y"),
            col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
          .distinct()
        val a = sh.select(col("doc_id").as("da"), col("sh").as("sha"))
        val b = sh.select(col("doc_id").as("db"), col("sh").as("shb"))
        val inter = size(array_intersect(col("sha"), col("shb")))
        val uni = size(col("sha")) + size(col("shb")) - inter
        cand.join(a, "da").join(b, "db")
          .withColumn("jaccard", inter.cast("double") / uni)
          .where(col("jaccard") >= jaccardThreshold)
          .select(col("da").as("doc_a"), col("db").as("doc_b"), col("jaccard"))
      }),

    // ---- SimHash fingerprint + byte-band candidates, Hamming ≤ 1 ----
    QueryDef("q_dedup_simhash", Some {
      val bandKeys = (0 until 4).map { b =>
        s"(SELECT doc_id, fp, $b AS band, (fp >> ${b * 8}) & 255 AS key FROM fp)"
      }.mkString("\nUNION ALL\n")
      s"""WITH hs AS (
         |  SELECT doc_id, ${tokenHashesSql(tokensSql("text"))} AS h FROM documents
         |),
         |fp AS (SELECT doc_id, ${simhash32FromHashesSql("h")} AS fp FROM hs),
         |bands AS ($bandKeys)
         |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |  bit_count(xor(x.fp, y.fp)) AS hamming
         |FROM bands x JOIN bands y
         |  ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.fp, y.fp)) <= 1""".stripMargin
    })(
      (s, d) => {
        val fp = Tables(s, d, "documents")
          .select(col("doc_id"), simhash32(tokens(col("text"))).as("fp"))
        val bands = fp.select(col("doc_id"), col("fp"), posexplode(
          array((0 until 4).map(b =>
            shiftright(col("fp"), b * 8).bitwiseAND(lit(255L))): _*))
          .as(Seq("band", "key")))
        bands.alias("x")
          .join(bands.alias("y"),
            col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
            bit_count(col("x.fp").bitwiseXOR(col("y.fp"))).as("hamming"))
          .where(col("hamming") <= 1)
          .distinct()
      }),

    // ---- embedding cosine near-dup (exact thresholded pairs) ----
    QueryDef("q_dedup_embedding", Some(
      s"""WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  ${cosineDSql("a.v", "b.v")} AS cos_sim
         |FROM n a JOIN n b ON a.vec_id < b.vec_id
         |WHERE ${cosineDSql("a.v", "b.v")} >= 0.45""".stripMargin))(
      (s, d) => {
        val e = Tables(s, d, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
            normD(col("embedding")).as("nrm"))
        val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
        val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
        a.join(b, col("vec_a") < col("vec_b"))
          .withColumn("cos_sim", dotD(col("va"), col("vb")) / (col("na") * col("nb")))
          .where(col("cos_sim") >= 0.45)
          .select(col("vec_a"), col("vec_b"), col("cos_sim"))
      })
  )
}
