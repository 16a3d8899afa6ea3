package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.TextOps.{h32, h32Sql, tokens}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for an LLM training pipeline
  * (north-star extension): sequence packing into fixed context
  * windows, sliding-window chunking with overlap, and
  * temperature-based source rebalancing. All deterministic — every
  * entry is exactly oracled.
  */
object CorpusPrepQueries {

  /** Context-window budget (tokens) for packing. */
  private val packBudget = 512L
  /** Shard width for the two-phase cumulative sum (see below). */
  private val shardWidth = 128L

  /** Chunk size / stride (tokens) for sliding-window chunking. */
  private val chunkLen = 128L
  private val chunkStride = 96L

  val defs: Seq[QueryDef] = Seq(

    // ---- sequence packing (concat-and-chunk): documents concatenate
    // in doc_id order into one global token stream, which is cut into
    // fixed `packBudget`-token context windows — each doc then spans
    // packs [start/B, (start+n−1)/B]. The global exclusive cumsum is
    // computed SCALE-SAFELY in two phases: a within-shard cumsum
    // (parallel, shard = doc_id/width is a pure function of the data,
    // so it is reproducible — unlike spark_partition_id) plus an
    // exclusive cumsum over per-shard totals (rows = corpus/width,
    // broadcast back). No stage ever globally sorts the corpus — the
    // single-partition window runs over shard AGGREGATES only. ----
    QueryDef("q_pack_sequences", Some(
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n,
         |    doc_id // $shardWidth AS shard
         |  FROM documents),
         |l AS (
         |  SELECT *, CAST(coalesce(sum(n) OVER (PARTITION BY shard
         |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |    0) AS BIGINT) AS local_off
         |  FROM t),
         |so AS (
         |  SELECT shard, CAST(coalesce(sum(tot) OVER (ORDER BY shard
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS shard_off
         |  FROM (SELECT shard, sum(n) AS tot FROM t GROUP BY shard))
         |SELECT l.doc_id, l.n AS n_tokens,
         |  l.local_off + so.shard_off AS start_tok,
         |  (l.local_off + so.shard_off) // $packBudget AS pack_first,
         |  (l.local_off + so.shard_off + l.n - 1) // $packBudget AS pack_last,
         |  (l.local_off + so.shard_off + l.n - 1) // $packBudget
         |    - (l.local_off + so.shard_off) // $packBudget + 1 AS n_packs
         |FROM l JOIN so ON l.shard = so.shard""".stripMargin))(
      (s, d) => {
        val docs = Tables(s, d, "documents")
          .select(col("doc_id"), tokens(col("text")).as("w"))
          .select(col("doc_id"), size(col("w")).cast("bigint").as("n"))
          .withColumn("shard", expr(s"doc_id DIV $shardWidth"))
        val wLocal = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val local = docs.withColumn("local_off",
          coalesce(sum(col("n")).over(wLocal), lit(0L)))
        val wShard = graft.ops.BoundedWindow.ordered(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val shardOff = docs.groupBy(col("shard")).agg(sum(col("n")).as("tot"))
          .withColumn("shard_off", coalesce(sum(col("tot")).over(wShard), lit(0L)))
          .select(col("shard"), col("shard_off"))
        local.join(broadcast(shardOff), "shard")
          .withColumn("start_tok", col("local_off") + col("shard_off"))
          .withColumn("pack_first", expr(s"start_tok DIV $packBudget"))
          .withColumn("pack_last", expr(s"(start_tok + n - 1) DIV $packBudget"))
          .select(col("doc_id"), col("n").as("n_tokens"), col("start_tok"),
            col("pack_first"), col("pack_last"),
            (col("pack_last") - col("pack_first") + lit(1L)).as("n_packs"))
      }),

    // ---- sliding-window chunking with overlap (RAG / long-context
    // prep): chunk k of a doc covers tokens [k·stride, k·stride+len);
    // the last chunk is the first one whose window reaches the end.
    // One explode per doc — n_chunks is arithmetic on the token count,
    // never a scan; boundary token VALUES are emitted so the oracle
    // pins the actual slicing, not just the counts. ----
    QueryDef("q_text_chunks", Some(
      s"""WITH t AS (
         |  SELECT doc_id, string_split(trim(text), ' ') AS w,
         |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, w, n,
         |    CASE WHEN n <= $chunkLen THEN 1
         |         ELSE (n - $chunkLen + $chunkStride - 1) // $chunkStride + 1
         |    END AS n_chunks
         |  FROM t),
         |e AS (
         |  SELECT doc_id, w, n, n_chunks,
         |    unnest(range(0, n_chunks)) AS chunk_id
         |  FROM c)
         |SELECT doc_id, chunk_id, n_chunks,
         |  chunk_id * $chunkStride AS chunk_start,
         |  least(n - chunk_id * $chunkStride, $chunkLen) AS chunk_tokens,
         |  w[CAST(chunk_id * $chunkStride + 1 AS INT)] AS first_token,
         |  w[CAST(chunk_id * $chunkStride
         |      + least(n - chunk_id * $chunkStride, $chunkLen) AS INT)] AS last_token
         |FROM e""".stripMargin))(
      (s, d) => {
        val t = Tables(s, d, "documents")
          .select(col("doc_id"), tokens(col("text")).as("w"))
          .withColumn("n", size(col("w")).cast("bigint"))
          .withColumn("n_chunks",
            when(col("n") <= chunkLen, lit(1L))
              .otherwise(expr(
                s"(n - $chunkLen + $chunkStride - 1) DIV $chunkStride + 1")))
        t.withColumn("chunk_id",
            explode(sequence(lit(0L), col("n_chunks") - 1)))
          .withColumn("chunk_start", col("chunk_id") * chunkStride)
          .withColumn("chunk_tokens",
            least(col("n") - col("chunk_start"), lit(chunkLen)))
          .select(col("doc_id"), col("chunk_id"), col("n_chunks"),
            col("chunk_start"), col("chunk_tokens"),
            element_at(col("w"), (col("chunk_start") + 1).cast("int"))
              .as("first_token"),
            element_at(col("w"),
              (col("chunk_start") + col("chunk_tokens")).cast("int"))
              .as("last_token"))
      }),

    // ---- temperature-based source rebalancing (the multilingual /
    // multi-source mixing step): sampling weight per source ∝
    // count^(1/T) with T=2 — big sources are downsampled toward the
    // flat mix, the smallest source keeps rate 1. Membership is
    // deterministic hash thresholding (h32(doc) < rate·2³²), so the
    // sample is a pure function of the data — reproducible, mergeable,
    // and exactly oracled (sqrt and one multiply are IEEE-identical in
    // both engines). Source stats are a tiny broadcast join. ----
    QueryDef("q_sample_temperature", Some(
      s"""WITH stats AS (
         |  SELECT source, count(*) AS cnt FROM documents GROUP BY source),
         |rates AS (
         |  SELECT source, cnt,
         |    sqrt((SELECT CAST(min(cnt) AS DOUBLE) FROM stats))
         |      / sqrt(CAST(cnt AS DOUBLE)) AS rate
         |  FROM stats)
         |SELECT r.source, r.cnt, r.rate,
         |  count(CASE WHEN CAST(${h32Sql("CAST(d.doc_id AS VARCHAR)")} AS DOUBLE)
         |    < r.rate * 4294967296.0 THEN 1 END) AS kept
         |FROM documents d JOIN rates r ON d.source = r.source
         |GROUP BY r.source, r.cnt, r.rate""".stripMargin))(
      (s, d) => {
        val docs = Tables(s, d, "documents")
          .select(col("doc_id"), col("source"))
        val stats = docs.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
        val minCnt = stats.agg(min(col("cnt")).cast("double").as("mn"))
        val rates = stats.crossJoin(broadcast(minCnt))
          .select(col("source"), col("cnt"),
            (sqrt(col("mn")) / sqrt(col("cnt").cast("double"))).as("rate"))
        docs.join(broadcast(rates), "source")
          .groupBy(col("source"), col("cnt"), col("rate"))
          .agg(count(when(
            h32(col("doc_id").cast("string")).cast("double")
              < col("rate") * lit(4294967296.0), 1)).as("kept"))
          .select(col("source"), col("cnt"), col("rate"), col("kept"))
      }),

    // ---- NEXT-FIT bin packing (the non-splitting variant of
    // `q_pack_sequences`): documents must not cross window boundaries,
    // so each doc lands whole in the current bin if it fits, else
    // opens a new one. The fold is inherently sequential, but only
    // WITHIN a shard (shard = doc_id DIV width — a pure function of
    // the data, reproducible under any partitioning): one shuffle on
    // the shard id, then an O(width) in-memory fold per shard via
    // flatMapGroups. Group size is bounded by `shardWidth` BY
    // CONSTRUCTION — no skew, no unbounded buffering — and shard
    // count grows with the corpus, so parallelism does too. A doc
    // longer than the budget occupies its own (overflowing) bin, as
    // in the oracle's recursion base. The oracle replays the same
    // fold as a per-shard recursive CTE. ----
    QueryDef("q_pack_nextfit", Some(
      s"""WITH RECURSIVE t AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n,
         |    doc_id // $shardWidth AS shard,
         |    row_number() OVER (PARTITION BY doc_id // $shardWidth
         |      ORDER BY doc_id) AS rn
         |  FROM documents),
         |nf AS (
         |  SELECT shard, rn, doc_id, n, CAST(0 AS BIGINT) AS bin, n AS fill
         |  FROM t WHERE rn = 1
         |  UNION ALL
         |  SELECT t.shard, t.rn, t.doc_id, t.n,
         |    CASE WHEN nf.fill + t.n > $packBudget THEN nf.bin + 1 ELSE nf.bin END,
         |    CASE WHEN nf.fill + t.n > $packBudget THEN t.n ELSE nf.fill + t.n END
         |  FROM nf JOIN t ON t.shard = nf.shard AND t.rn = nf.rn + 1)
         |SELECT doc_id, shard, bin, n AS n_tokens, fill AS fill_after
         |FROM nf""".stripMargin))(
      (s, d) => {
        import s.implicits._
        Tables(s, d, "documents")
          .select(col("doc_id"),
            size(tokens(col("text"))).cast("bigint").as("n"),
            expr(s"doc_id DIV $shardWidth").as("shard"))
          .as[(Long, Long, Long)]
          .groupByKey(_._3)
          .flatMapGroups { (shard, it) =>
            // ≤ shardWidth rows per group; flatMapGroups does not
            // guarantee intra-group order, so sort the bounded buffer
            val docs = it.toArray.sortBy(_._1)
            var bin = 0L
            var fill = 0L
            var first = true
            docs.iterator.map { case (docId, n, _) =>
              if (first) { first = false; fill = n }
              else if (fill + n > packBudget) { bin += 1; fill = n }
              else fill += n
              (docId, shard, bin, n, fill)
            }
          }
          .toDF("doc_id", "shard", "bin", "n_tokens", "fill_after")
      }),

    // ---- FIRST-FIT-DECREASING bin packing (the quality upgrade over
    // next-fit: FFD wastes ≤ 11/9·OPT + 6/9 bins vs next-fit's 2·OPT):
    // docs sort size-DESC within their shard, each lands in the FIRST
    // open bin it fits, else opens a new one. Same scale shape as
    // `q_pack_nextfit` — the fold is sequential only WITHIN a shard
    // (bounded at `shardWidth` rows by construction), one shuffle on
    // the shard id, O(width · bins) per group in memory. The oracle
    // replays the identical fold as a per-shard recursive CTE whose
    // state is the LIST of bin fills (first-fit index via
    // list_position over a lambda; functional list update via
    // slicing). Bins are 1-based; a doc longer than the budget opens
    // its own overflowing bin (never fits an existing one, and no
    // later doc joins it unless space remains). ----
    // Oracle notes: `pos` (the first-fit index) is computed ONCE in a
    // derived table around the recursive join — repeating the
    // list_position expression per output column makes DuckDB's
    // recursion blow up super-linearly (measured: 500 rows went from
    // >120 s to 0.12 s), and the slice-based list update
    // (fills[:p-1] || [..] || fills[p+1:]) is the pathological part,
    // so the update is an index-lambda list_transform instead. DuckDB
    // 1.0 list_position returns 0 (not NULL) on no match — nullif
    // normalizes it.
    QueryDef("q_pack_firstfit", Some(
      s"""WITH RECURSIVE t AS (
         |  SELECT doc_id, n, shard,
         |    row_number() OVER (PARTITION BY shard
         |      ORDER BY n DESC, doc_id) AS rn
         |  FROM (SELECT doc_id,
         |          CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n,
         |          doc_id // $shardWidth AS shard
         |        FROM documents)),
         |ff AS (
         |  SELECT shard, rn, doc_id, n, CAST(1 AS BIGINT) AS bin,
         |    n AS fill_after, [n] AS fills
         |  FROM t WHERE rn = 1
         |  UNION ALL
         |  SELECT shard, rn, doc_id, n,
         |    CAST(coalesce(pos, len(fills) + 1) AS BIGINT) AS bin,
         |    CASE WHEN pos IS NULL THEN n ELSE fills[pos] + n END AS fill_after,
         |    CASE WHEN pos IS NULL THEN list_append(fills, n)
         |         ELSE list_transform(fills,
         |           (f, i) -> CASE WHEN i = pos THEN f + n ELSE f END)
         |    END AS fills
         |  FROM (
         |    SELECT t.shard, t.rn, t.doc_id, t.n AS n, ff.fills,
         |      nullif(list_position(
         |        list_transform(ff.fills, f -> f + t.n <= $packBudget), true),
         |        0) AS pos
         |    FROM ff JOIN t ON t.shard = ff.shard AND t.rn = ff.rn + 1))
         |SELECT doc_id, shard, bin, n AS n_tokens, fill_after
         |FROM ff""".stripMargin))(
      (s, d) => {
        import s.implicits._
        Tables(s, d, "documents")
          .select(col("doc_id"),
            size(tokens(col("text"))).cast("bigint").as("n"),
            expr(s"doc_id DIV $shardWidth").as("shard"))
          .as[(Long, Long, Long)]
          .groupByKey(_._3)
          .flatMapGroups { (shard, it) =>
            // ≤ shardWidth rows per group; sort size-DESC (doc_id
            // tie-break) in the bounded buffer — flatMapGroups does
            // not guarantee intra-group order
            val docs = it.toArray.sortBy { case (id, n, _) => (-n, id) }
            val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
            docs.iterator.map { case (docId, n, _) =>
              val i = fills.indexWhere(_ + n <= packBudget)
              val (bin, after) =
                if (i >= 0) { fills(i) += n; (i + 1L, fills(i)) }
                else { fills += n; (fills.length.toLong, n) }
              (docId, shard, bin, n, after)
            }
          }
          .toDF("doc_id", "shard", "bin", "n_tokens", "fill_after")
      }),

    // ---- length-bucketed batching (dynamic batching): docs group
    // into 64-token-wide length buckets; a bucket with max length L
    // packs cap = max(1, 4096 DIV L) docs per batch, so every batch
    // pads only to ITS bucket's ceiling instead of the global max —
    // the standard padding-waste reduction for variable-length
    // training batches. Per bucket: batch count (exact ceil by
    // integer arithmetic), padded-token total (batch grid minus real
    // tokens), and a 1e6-scaled fill efficiency. Scale: ONE
    // shuffle-free scan + one |buckets|-key hash-agg (bucket count ≤
    // max-doc-len/64, data-independent); no window, no join. ----
    QueryDef("q_pack_length_bucketed", Some(
      """WITH t AS (
        |  SELECT CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n
        |  FROM documents),
        |b AS (SELECT n, n // 64 AS bucket, 64 * (n // 64 + 1) AS maxlen
        |      FROM t),
        |g AS (SELECT bucket, maxlen,
        |    CASE WHEN 4096 // maxlen > 1 THEN 4096 // maxlen ELSE 1 END
        |      AS cap,
        |    count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS sum_tokens
        |  FROM b GROUP BY bucket, maxlen)
        |SELECT bucket, maxlen, cap, n_docs,
        |  (n_docs + cap - 1) // cap AS n_batches,
        |  CAST(((n_docs + cap - 1) // cap) * cap * maxlen - sum_tokens
        |    AS BIGINT) AS padded_tokens,
        |  CAST((1000000 * sum_tokens)
        |    // (((n_docs + cap - 1) // cap) * cap * maxlen) AS BIGINT)
        |    AS fill_ppm
        |FROM g""".stripMargin))(
      (s, d) => {
        val t = Tables(s, d, "documents")
          .select(size(tokens(col("text"))).cast("bigint").as("n"))
        val g = t
          .select(col("n"), expr("n DIV 64").as("bucket"),
            expr("64 * (n DIV 64 + 1)").as("maxlen"))
          .select(col("n"), col("bucket"), col("maxlen"),
            greatest(expr("4096 DIV maxlen"), lit(1L)).as("cap"))
          .groupBy(col("bucket"), col("maxlen"), col("cap"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("sum_tokens"))
        g.select(col("bucket"), col("maxlen"), col("cap"), col("n_docs"),
          expr("(n_docs + cap - 1) DIV cap").as("n_batches"),
          expr("((n_docs + cap - 1) DIV cap) * cap * maxlen - sum_tokens")
            .as("padded_tokens"),
          expr("(1000000 * sum_tokens) DIV " +
            "(((n_docs + cap - 1) DIV cap) * cap * maxlen)").as("fill_ppm"))
      }),

    // ---- deterministic epoch shuffle: every epoch needs a fresh,
    // reproducible global permutation of the corpus. Position =
    // rank of h32(doc_id # epoch) within the epoch — but computed
    // WITHOUT a global sort: the hash's high bits define 32 ordered
    // shards (shard = key DIV 2^27 preserves key order across shard
    // boundaries), each shard ranks locally in parallel, and a
    // 64-row per-(epoch, shard) count table turns local ranks into
    // global positions via an exclusive cumsum computed over shard
    // AGGREGATES only and broadcast back. Deterministic under any
    // partitioning (pure function of doc_id — no rand(), whose
    // sequence is partition-relative). Scale: one corpus shuffle on
    // the shard key per epoch batch; the single-partition window
    // touches 64 aggregate rows, never the corpus. ----
    QueryDef("q_corpus_epoch_shuffle", Some(
      s"""WITH k AS (
         |  SELECT doc_id, e.e AS epoch,
         |    ${h32Sql("CAST(doc_id AS VARCHAR) || '#' || CAST(e.e AS VARCHAR)")} AS key
         |  FROM documents, (SELECT e FROM range(0, 2) t(e)) e)
         |SELECT doc_id, epoch,
         |  CAST(row_number() OVER (PARTITION BY epoch ORDER BY key, doc_id)
         |    AS BIGINT) AS pos
         |FROM k""".stripMargin))(
      (s, d) => {
        val k = Tables(s, d, "documents")
          .select(col("doc_id"),
            explode(sequence(lit(0L), lit(1L))).as("epoch"))
          .select(col("doc_id"), col("epoch"),
            h32(concat(col("doc_id").cast("string"), lit("#"),
              col("epoch").cast("string"))).as("key"))
          .withColumn("shard", expr("key DIV 134217728")) // 2^27: 32 ordered shards
        val offs = k.groupBy(col("epoch"), col("shard"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("off",
            coalesce(sum(col("cnt")).over(
              Window.partitionBy(col("epoch")).orderBy(col("shard"))
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("epoch"), col("shard"), col("off"))
        val local = Window.partitionBy(col("epoch"), col("shard"))
          .orderBy(col("key").asc, col("doc_id").asc)
        k.withColumn("rn", row_number().over(local))
          .join(broadcast(offs), Seq("epoch", "shard"))
          .select(col("doc_id"), col("epoch"),
            (col("off") + col("rn")).cast("bigint").as("pos"))
      })
  )
}
