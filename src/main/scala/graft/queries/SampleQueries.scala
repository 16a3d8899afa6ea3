package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.TextOps._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting surface for training-data curation
  * (north-star extension set): content-keyed train/val/test splits,
  * per-class stratified caps, and weighted corpus mixing. Everything
  * keys on the portable md5-based `h32` so the assignment is (a)
  * reproducible across runs AND engines — no RNG, the DuckDB twin
  * computes the identical split — and (b) stable under repartitioning,
  * which `rand(seed)` is not (its sequence is per-partition, so a
  * repartitioned rerun silently reassigns every row). At 100 TB each
  * query is a single embarrassingly-parallel scan (split/mix) or one
  * shuffle on the class key (stratified cap).
  */
object SampleQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- leakage-safe train/val/test split (80/10/10) ----
    // Keyed on the CONTENT hash, not the doc id: byte-identical
    // duplicates land in the SAME split by construction, so exact-dup
    // leakage from train into test is impossible even before any dedup
    // pass runs.
    QueryDef("q_sample_split", Some(
      s"""SELECT doc_id, lang,
         |  ${h32Sql("text")} % 100 AS bucket,
         |  CASE WHEN ${h32Sql("text")} % 100 < 80 THEN 'train'
         |       WHEN ${h32Sql("text")} % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin))(
      (s, d) => {
        val bucket = pmod(h32(col("text")), lit(100L))
        Tables(s, d, "documents")
          .select(col("doc_id"), col("lang"), bucket.as("bucket"),
            when(bucket < 80, "train")
              .when(bucket < 90, "val")
              .otherwise("test").as("split"))
      }),

    // ---- stratified per-class cap (deterministic reservoir) ----
    // Keep at most 50 docs per language, chosen by hash rank — the
    // downsample every class-balanced training mix needs, without an
    // RNG. One shuffle on the class key; the rank is a window over
    // each class partition.
    QueryDef("q_sample_stratified", Some(
      s"""SELECT doc_id, lang, class_rank FROM (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ${h32Sql("CAST(doc_id AS VARCHAR)")}, doc_id) AS class_rank
         |  FROM documents)
         |WHERE class_rank <= 50""".stripMargin))(
      (s, d) => {
        val w = Window.partitionBy(col("lang"))
          .orderBy(h32(col("doc_id").cast("string")), col("doc_id"))
        Tables(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            row_number().over(w).cast("bigint").as("class_rank"))
          .where(col("class_rank") <= 50)
      }),

    // ---- weighted corpus mixing ----
    // Interleave two sub-corpora at 75%/25% sampling rates via the
    // same hash buckets (sampling a source at rate w = keeping buckets
    // < 100w). Deterministic, single-pass, union-only — the mixing
    // stage of a data recipe, with per-source provenance kept.
    QueryDef("q_sample_mix", Some(
      s"""SELECT doc_id, lang AS source_lang, n_chars
         |FROM (SELECT doc_id, lang, length(text) AS n_chars,
         |        ${h32Sql("text")} % 100 AS bucket FROM documents)
         |WHERE (lang = 'en' AND bucket < 75) OR (lang = 'de' AND bucket < 25)""".stripMargin))(
      (s, d) => {
        val base = Tables(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            length(col("text")).cast("bigint").as("n_chars"),
            pmod(h32(col("text")), lit(100L)).as("bucket"))
        base.where(col("lang") === "en" && col("bucket") < 75)
          .unionByName(base.where(col("lang") === "de" && col("bucket") < 25))
          .select(col("doc_id"), col("lang").as("source_lang"), col("n_chars"))
      }),

    // ---- per-class top-quantile selection: keep the best 20% of each
    // language by a quality score (n_chars here; any scored column
    // works), deterministic tiebreak on doc_id. The quantile cut is
    // exact integer arithmetic (rank*5 <= class size), not a
    // percent_rank double compare. One shuffle on the class key; both
    // window functions share the single sort. ----
    QueryDef("q_sample_top_quantile", Some(
      """SELECT doc_id, lang, n_chars, q_rank FROM (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY n_chars DESC, doc_id) AS q_rank,
        |    count(*) OVER (PARTITION BY lang) AS n_lang
        |  FROM documents)
        |WHERE q_rank * 5 <= n_lang""".stripMargin))(
      (s, d) => {
        val byScore = Window.partitionBy(col("lang"))
          .orderBy(col("n_chars").desc, col("doc_id").asc)
        val byClass = Window.partitionBy(col("lang"))
        Tables(s, d, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"),
            row_number().over(byScore).cast("bigint").as("q_rank"),
            count(lit(1)).over(byClass).as("n_lang"))
          .where(col("q_rank") * 5 <= col("n_lang"))
          .select(col("doc_id"), col("lang"), col("n_chars"), col("q_rank"))
      }),

    // ---- weighted sample WITHOUT replacement (priority sampling,
    // Duffield–Lund–Thorup): each row draws priority w/u with u
    // uniform in (0,1]; the k highest-priority rows are a weighted
    // k-sample. u comes from the portable hash — u = (h+1)/2^32 — so
    // the draw is deterministic and engine-reproducible, and the
    // constant 2^32 factor is dropped (monotone): priority =
    // w / (h+1), ONE IEEE double division, which both engines round
    // identically (division is a correctly-rounded primitive — this
    // is the only FP op in the query). Weight = n_chars, so long
    // docs are proportionally likelier, the standard byte-budget
    // sampler. Scale: orderBy+limit compiles to TakeOrderedAndProject
    // — per-partition top-k heaps, only k rows per partition reach
    // the driver; no global sort, no shuffle of the corpus. ----
    QueryDef("q_sample_weighted", Some(
      s"""SELECT doc_id, lang, n_chars,
         |  CAST(n_chars AS DOUBLE)
         |    / CAST(${h32Sql("CAST(doc_id AS VARCHAR)")} + 1 AS DOUBLE)
         |    AS priority
         |FROM documents
         |ORDER BY priority DESC, doc_id LIMIT 100""".stripMargin))(
      (s, d) => {
        val priority = col("n_chars").cast("double") /
          (h32(col("doc_id").cast("string")) + lit(1L)).cast("double")
        Tables(s, d, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"),
            priority.as("priority"))
          .orderBy(col("priority").desc, col("doc_id"))
          .limit(100)
      }),

    // ---- largest-remainder (Hamilton) apportionment of a char
    // budget across languages — the data-mixing step that turns
    // target proportions into an EXACT integer allocation: floats
    // proportional shares drift (sum != budget); here base quotas
    // floor(B·w/W) plus one extra char... unit to the largest
    // remainders make sum(alloc) == B by construction. Weights =
    // per-lang doc counts (proportional-to-representation mix);
    // rate = alloc/avail is the sampling rate the downstream
    // weighted sampler would apply per lang. Scale: one groupBy on
    // lang; the windows run over n_langs rows (the aggregated
    // frame), not the corpus. ----
    QueryDef("q_mix_apportion", Some(
      """WITH a AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS w,
        |    CAST(sum(n_chars) AS BIGINT) AS avail
        |  FROM documents GROUP BY lang),
        |q AS (SELECT lang, w, avail,
        |        1000000 * w AS num,
        |        CAST(sum(w) OVER () AS BIGINT) AS tw FROM a),
        |b AS (SELECT lang, w, avail,
        |        CAST(floor(num / tw) AS BIGINT) AS base,
        |        (num % tw) AS rem FROM q),
        |b2 AS (SELECT lang, w, avail, base, rem,
        |         CAST(1000000 - sum(base) OVER () AS BIGINT) AS k,
        |         row_number() OVER (ORDER BY rem DESC, lang) AS rnk
        |       FROM b)
        |SELECT lang, w, avail,
        |  (base + CASE WHEN rnk <= k THEN 1 ELSE 0 END) AS alloc,
        |  CAST(base + CASE WHEN rnk <= k THEN 1 ELSE 0 END AS DOUBLE)
        |    / avail AS rate
        |FROM b2""".stripMargin))(
      (s, d) => {
        val wAll = graft.ops.BoundedWindow.all()
        val a = Tables(s, d, "documents")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("w"), sum(col("n_chars")).as("avail"))
        val q = a.select(col("lang"), col("w"), col("avail"),
          (lit(1000000L) * col("w")).as("num"),
          sum(col("w")).over(wAll).as("tw"))
        val b = q.select(col("lang"), col("w"), col("avail"),
          expr("CAST(floor(num / tw) AS BIGINT)").as("base"),
          (col("num") % col("tw")).as("rem"))
        val b2 = b.select(col("lang"), col("w"), col("avail"), col("base"),
          col("rem"),
          (lit(1000000L) - sum(col("base")).over(wAll)).as("k"),
          row_number().over(
            graft.ops.BoundedWindow.ordered(col("rem").desc, col("lang")))
            .as("rnk"))
        b2.select(col("lang"), col("w"), col("avail"),
          (col("base") + when(col("rnk") <= col("k"), 1L).otherwise(0L))
            .as("alloc"),
          ((col("base") + when(col("rnk") <= col("k"), 1L).otherwise(0L))
            .cast("double") / col("avail")).as("rate"))
      }),

    // ---- systematic sampling: every 10th document per source in a
    // fixed key order — the stratified-coverage complement of the
    // hash samplers (hash picks are uniform but clumpy; a systematic
    // stride guarantees even coverage across the ordered key range,
    // the classic QA-review draw). The stride anchor is rank 1 per
    // source, ranks come from a per-source row_number over the unique
    // doc_id, and membership is exact modular arithmetic — fully
    // deterministic, no RNG. Scale: one source-partitioned window. ----
    QueryDef("q_sample_systematic", Some(
      """SELECT doc_id, source, n_chars, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn % 10 = 1""".stripMargin))(
      (s, d) => {
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id").asc)
        Tables(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"),
            row_number().over(w).as("rn"))
          .where(col("rn") % 10 === 1)
          .select(col("doc_id"), col("source"), col("n_chars"),
            col("rn").cast("bigint").as("rn"))
      }),

    // ---- nucleus (top-p) selection per source: rank docs by length
    // (the quality-score stand-in) and keep the SMALLEST prefix whose
    // cumulative byte mass reaches half the group total — including
    // the row that crosses the threshold, the standard top-p rule. The
    // cut is exact integer arithmetic on the running sum (a row
    // survives iff the mass STRICTLY BEFORE it is under p·total:
    // 2·(cum − own) < total for p = ½), so there is no float epsilon
    // at the boundary in either engine. Unlike top-quantile (fixed
    // COUNT fraction), the prefix adapts to the mass distribution —
    // a head-heavy source contributes few docs, a flat one many.
    // Scale: two windows per source partition, no global sort; the
    // per-group running sum is the only sequential dependency. ----
    QueryDef("q_sample_nucleus", Some(
      """SELECT doc_id, source, n_chars,
        |  CAST(cum AS BIGINT) AS cum_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |    sum(n_chars) OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS cum,
        |    sum(n_chars) OVER (PARTITION BY source) AS tot
        |  FROM documents)
        |WHERE (cum - n_chars) * 2 < tot""".stripMargin))(
      (s, d) => {
        val byMass = Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id").asc)
        val whole = Window.partitionBy(col("source"))
        Tables(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"),
            sum(col("n_chars")).over(byMass).as("cum"),
            sum(col("n_chars")).over(whole).as("tot"))
          .where((col("cum") - col("n_chars")) * 2 < col("tot"))
          .select(col("doc_id"), col("source"), col("n_chars"),
            col("cum").cast("bigint").as("cum_chars"))
      }),

    // ---- DSIR-flavored importance scoring (log-free linear variant):
    // rank the corpus by how target-domain-like each doc's hashed
    // bag-of-words is. Features are unigrams hashed into 256 buckets
    // (h32 mod 256 — the hashed-ngram trick from DSIR, Xie et al.
    // 2023); the target distribution is the lang='en' slice, the
    // source distribution the whole corpus; each bucket's weight is
    // the 1e9-scaled probability DIFFERENCE (1e9·t_cnt DIV t_tot −
    // 1e9·s_cnt DIV s_tot) — the log-free linear stand-in for the
    // log-ratio (same sign structure; exact integers, so scores are
    // bit-identical cross-engine where log-ratios would not be). A
    // doc's score is Σ_buckets c_b·w_b — int64-safe (≤ tokens·1e9 per
    // doc). Top-25 by (score DESC, doc_id) is the selected resample.
    // Scale shape: explode → per-(doc,bucket) counts → a 256-row
    // broadcast weight table → one hash-agg per doc →
    // TakeOrderedAndProject; the corpus never shuffles by content. ----
    QueryDef("q_sample_importance", Some(
      s"""WITH tok AS (
         |  SELECT d.doc_id, d.lang, ${h32Sql("t.w")} % 256 AS b
         |  FROM documents d, unnest(${tokensSql("d.text")}) AS t(w)),
         |db AS (SELECT doc_id, b, count(*) AS c FROM tok GROUP BY doc_id, b),
         |tgt AS (SELECT b, count(*) AS tc FROM tok WHERE lang = 'en' GROUP BY b),
         |src AS (SELECT b, count(*) AS sc FROM tok GROUP BY b),
         |tot AS (
         |  SELECT (SELECT count(*) FROM tok WHERE lang = 'en') AS tt,
         |         (SELECT count(*) FROM tok) AS st),
         |wgt AS (
         |  SELECT src.b,
         |    (1000000000 * coalesce(tgt.tc, 0)) // tot.tt
         |      - (1000000000 * src.sc) // tot.st AS w
         |  FROM src LEFT JOIN tgt ON src.b = tgt.b CROSS JOIN tot)
         |SELECT db.doc_id,
         |  CAST(sum(db.c * wgt.w) AS BIGINT) AS score_scaled,
         |  CAST(sum(db.c) AS BIGINT) AS n_tokens,
         |  CAST(row_number() OVER (ORDER BY sum(db.c * wgt.w) DESC,
         |    db.doc_id) AS BIGINT) AS rnk
         |FROM db JOIN wgt ON db.b = wgt.b
         |GROUP BY db.doc_id
         |ORDER BY score_scaled DESC, db.doc_id LIMIT 25""".stripMargin))(
      (s, d) => {
        val tok = Tables(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            explode(tokens(col("text"))).as("t"))
          .select(col("doc_id"), col("lang"),
            pmod(h32(col("t")), lit(256L)).as("b"))
          .persist() // feature counts read 3× (doc, target, source)
        val db = tok.groupBy(col("doc_id"), col("b"))
          .agg(count(lit(1)).as("c"))
        val tgt = tok.where(col("lang") === "en")
          .groupBy(col("b")).agg(count(lit(1)).as("tc"))
        val src = tok.groupBy(col("b")).agg(count(lit(1)).as("sc"))
        val tot = tok.where(col("lang") === "en")
          .agg(count(lit(1)).as("tt"))
          .crossJoin(tok.agg(count(lit(1)).as("st")))
        val wgt = src.join(tgt, Seq("b"), "left_outer")
          .crossJoin(broadcast(tot))
          .select(col("b"),
            (expr("(1000000000 * coalesce(tc, 0)) DIV tt")
              - expr("(1000000000 * sc) DIV st")).as("w"))
        val scored = db.join(broadcast(wgt), "b")
          .groupBy(col("doc_id"))
          .agg(sum(col("c") * col("w")).as("score_scaled"),
            sum(col("c")).as("n_tokens"))
          .orderBy(col("score_scaled").desc, col("doc_id").asc)
          .limit(25)
        val w = graft.ops.BoundedWindow.ordered(col("score_scaled").desc, col("doc_id").asc)
        scored.withColumn("rnk", row_number().over(w).cast("bigint"))
          .select(col("doc_id"), col("score_scaled"), col("n_tokens"),
            col("rnk"))
      }),

    // ---- cluster-safe split: q_sample_split's content-hash keying
    // stops EXACT-dup leakage, but near-duplicates hash differently
    // and can still straddle train/test. This split keys on the
    // NEAR-DUP CLUSTER id (composing q_dedup_clusters on both the
    // plan and the oracle side), so an entire LSH cluster lands in
    // one split by construction — the leakage-safe protocol for
    // held-out evaluation (Lee et al.: near-dup train/test overlap
    // inflates eval scores). Output is per-split doc and cluster
    // accounting; the oracle recomputes the full assignment, so any
    // drift in clustering OR hashing fails the gate. Scale: adds one
    // vocabulary-free hash + a 3-key hash-agg on top of the
    // clustering (whose near-linear candidate growth is measured in
    // SCALING.md). ----
    QueryDef("q_sample_split_cluster_safe", Some(
      s"""WITH RECURSIVE ${DedupQueries.clustersPairsCte},
         |cl AS (${DedupQueries.clustersSelect}),
         |b AS (SELECT doc_id, cluster_id,
         |    ${h32Sql("CAST(cluster_id AS VARCHAR)")} % 10 AS bk
         |  FROM cl)
         |SELECT CASE WHEN bk < 8 THEN 'train' WHEN bk = 8 THEN 'val'
         |         ELSE 'test' END AS split,
         |  count(*) AS n_docs,
         |  count(DISTINCT cluster_id) AS n_clusters
         |FROM b GROUP BY 1""".stripMargin))(
      (s, d) => {
        val cl = QueryDef.requireDef(DedupQueries.defs, "q_dedup_clusters",
          "q_sample_split_cluster_safe").fn(s, d)
        val bk = pmod(h32(col("cluster_id").cast("string")), lit(10L))
        cl.select(col("doc_id"), col("cluster_id"), bk.as("bk"))
          .select(col("doc_id"), col("cluster_id"),
            when(col("bk") < 8, "train").when(col("bk") === 8, "val")
              .otherwise("test").as("split"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("cluster_id")).as("n_clusters"))
      })
  )
}
