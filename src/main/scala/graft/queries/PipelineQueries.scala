package graft.queries

import graft.QueryDef
import graft.ops.Relational
import graft.pipeline._
import java.nio.file.Files

/** End-to-end run of the L2 pipeline runtime (the reference's whole
  * program, py:376-448) registered as an ORACLED query: extract 4
  * filtered sources → stage raw → join → project → stage transformed →
  * checkpointed per-file load → read the loaded target back. The DuckDB
  * twin is the equivalent single SQL statement, so the correctness gate
  * covers the staging/checkpoint/load machinery, not just the algebra.
  */
object PipelineQueries {

  /** The reference config's predicate shapes (json:53-58) over fixtures. */
  def spec(workspace: String): JobSpec = JobSpec(
    workspace = workspace,
    tables = Seq(TableSpec(
      targetTable = "enriched_lineitem",
      sources = Seq(
        SourceSpec("lineitem", filter = Some("l_quantity >= 20 AND l_quantity <= 45")),
        SourceSpec("orders", filter = Some("o_orderstatus = 'F' AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')")),
        SourceSpec("customer"),
        SourceSpec("nation", filter = Some("n_name IN ('NATION_1', 'NATION_3', 'NATION_5', 'NATION_7', 'NATION_9', 'NATION_11')"))),
      root = "lineitem",
      joins = Seq(
        JoinSpec("orders", "l_orderkey", "o_orderkey"),
        JoinSpec("customer", "o_custkey", "c_custkey"),
        JoinSpec("nation", "c_nationkey", "n_nationkey")),
      transformedColumns = Seq(
        "l_orderkey AS order_id",
        "l_linenumber AS line_no",
        "l_quantity AS qty",
        "l_extendedprice AS price",
        "o_orderpriority AS priority",
        "c_name AS customer_name",
        "c_mktsegment AS segment",
        "n_name AS nation"))))

  private val oracle =
    """SELECT l_orderkey AS order_id, l_linenumber AS line_no,
      |  l_quantity AS qty, l_extendedprice AS price,
      |  o_orderpriority AS priority, c_name AS customer_name,
      |  c_mktsegment AS segment, n_name AS nation
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_quantity >= 20 AND l_quantity <= 45
      |  AND o_orderstatus = 'F'
      |  AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
      |  AND n_name IN ('NATION_1', 'NATION_3', 'NATION_5', 'NATION_7', 'NATION_9', 'NATION_11')""".stripMargin


  /** Export-budget / packing constants for q_corpus_export_e2e. */
  private val exportDocs = 200
  private val exportShardWidth = 100
  private val exportPackBudget = 2000

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_pipeline_e2e", effectful = true, oracle = Some(oracle))(
      (s, d) => {
        // Fresh workspace per invocation (deliberately NOT memoized:
        // the query checks the happy path end-to-end; resume/skip
        // semantics are covered by PipelineSpec's kill-and-resume on a
        // pre-seeded workspace). `effectful` keeps plan-only sweeps
        // from paying the run.
        val ws = Files.createTempDirectory("graft_pipeline_").toString
        val sp = spec(ws)
        new Pipeline(s, sp,
          src => Relational.scanParquet(s, s"$d/${src.name}.parquet"),
          retryInitialDelayMs = 50).runAll()
        Relational.scanParquet(s, sp.targetDir("enriched_lineitem"))
      }),

    // ---- the V2 MIGRATION e2e: the reference pipeline (py:376-421)
    // loading into the DataSource V2 keyed table, composed with every
    // round-15/16 seam in one oracled run — (1) extract→transform→
    // checkpointed load through V2IdempotentKeyedTableSink with an
    // INJECTED CRASH after file 2's append but before its checkpoint
    // (the at-least-once hazard window of SURVEY.md §3.4); the
    // pipeline's retry re-drives the file and the sink's named
    // manifest makes the replay a no-op — exactly-once delivery,
    // which is what lets this entry be HASH-gated at all; (2) table
    // vacuum sweeping injected stray bytes without touching committed
    // rows; (3) manifest COMPACTION folding the per-file commits into
    // one checkpoint manifest; (4) the compacted table TAILED as a
    // micro-batch stream (logical manifest names survive compaction,
    // so pacing still sees one unit per original commit) into a
    // downstream aggregate. The final hash covers the whole chain:
    // any duplicate, lost, or re-delivered file breaks it. ----
    QueryDef("q_migrate_v2_e2e", effectful = true, oracle = Some(
      """SELECT n_name AS nation, o_orderpriority AS priority,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
        |    AS BIGINT) AS qty_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_quantity >= 20 AND l_quantity <= 45
        |  AND o_orderstatus = 'F'
        |  AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
        |  AND n_name IN ('NATION_1', 'NATION_3', 'NATION_5', 'NATION_7',
        |    'NATION_9', 'NATION_11')
        |GROUP BY n_name, o_orderpriority""".stripMargin))(
      (s, d) => {
        import org.apache.spark.sql.functions._
        val ws = Files.createTempDirectory("graft_v2e2e_").toString
        val sp = spec(ws)
        val target = sp.targetDir("enriched_lineitem")
        // crash exactly once, AFTER the second file's rows are
        // committed in the table but BEFORE the pipeline checkpoints
        // the file — the worst-case resume window
        var appends = 0
        var crashed = false
        val chaosSink = new AppendSink {
          private val inner = V2IdempotentKeyedTableSink("order_id")
          def append(df: org.apache.spark.sql.DataFrame,
              t: String): Unit = throw new UnsupportedOperationException
          override def append(df: org.apache.spark.sql.DataFrame,
              t: String, sourceFile: String): Unit = {
            inner.append(df, t, sourceFile)
            appends += 1
            if (appends == 2 && !crashed) {
              crashed = true
              throw new RuntimeException(
                "graft-chaos: crash between append and checkpoint")
            }
          }
        }
        new Pipeline(s, sp,
          src => Relational.scanParquet(s, s"$d/${src.name}.parquet"),
          sink = chaosSink, retryInitialDelayMs = 50).runAll()
        assert(crashed, "the injected crash never fired")
        // stray staged bytes (a writer that died pre-task-commit would
        // leave these) are vacuumed; committed rows are untouchable
        val fs = org.apache.hadoop.fs.FileSystem.getLocal(
          s.sparkContext.hadoopConfiguration)
        val stray = new org.apache.hadoop.fs.Path(s"$target/data/stray.rows")
        val out0 = fs.create(stray, true)
        out0.write(Array[Byte](1, 2, 3)); out0.close()
        val reaped = graft.sources.KeyedTable.vacuum(target, graceMs = 0L)
        assert(reaped == Seq("stray.rows"),
          s"vacuum reaped the wrong set: $reaped")
        // compaction folds the per-file commit manifests into one
        // checkpoint; logical names (and the tail's pacing unit) survive
        val folded = graft.sources.KeyedTable.compact(target)
        assert(folded.size >= 4,
          s"expected >=4 per-file manifests folded, got $folded")
        val q = s.readStream.format("graft.sources.KeyedTable")
          .option("manifestsPerTrigger", "2").load(target)
          .writeStream.format("parquet")
          .option("path", s"$ws/tailed")
          .option("checkpointLocation", s"$ws/tail_ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        assert(q.awaitTermination(300000), "v2 e2e tail did not finish")
        assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
          "tail pacing collapsed after compaction")
        val out = s.read.parquet(s"$ws/tailed")
          .groupBy(col("nation"), col("priority"))
          .agg(count(lit(1)).as("n_rows"),
            (sum(col("qty").cast("decimal(18,2)").multiply(lit(100))
              .cast("long"))).cast("long").as("qty_cents"))
          .localCheckpoint(true)
        graft.queries.StreamingQueries.deleteRecursively(ws)
        out
      }),

    // ---- composed CURATION pipeline e2e: the catalog's corpus
    // operators chained as one DAG — quality gate (the full
    // C4/Gopher rule battery of q_text_quality_rules, shared via
    // TextQueries.qualityFlags — integer-exact keep bit) → exact
    // dedup (keep the min doc_id per content hash) → leakage-safe
    // content-hash split → per (split, lang) release report. This is
    // the "a user can run their whole recipe on this library" proof:
    // each stage is individually oracled elsewhere; here the
    // COMPOSITION is oracled end-to-end. Scale: one token-stat scan
    // (battery is shuffle-free), one hash-shuffle groupBy for dedup
    // keepers (broadcast back), split assignment row-local, final
    // report a |splits×langs| aggregate. ----
    QueryDef("q_curation_e2e", Some {
      import graft.ops.TextOps.h32Sql
      s"""WITH ${TextQueries.qualityCteSql},
         |quality AS (
         |  SELECT doc_id, lang, text, n_tokens FROM qflags WHERE keep),
         |keepers AS (
         |  SELECT md5(text) AS h, min(doc_id) AS keeper
         |  FROM quality GROUP BY md5(text)),
         |deduped AS (
         |  SELECT q.* FROM quality q
         |  JOIN keepers k ON md5(q.text) = k.h AND q.doc_id = k.keeper),
         |split AS (
         |  SELECT *, CASE WHEN ${h32Sql("text")} % 100 < 80 THEN 'train'
         |    WHEN ${h32Sql("text")} % 100 < 90 THEN 'val'
         |    ELSE 'test' END AS split
         |  FROM deduped)
         |SELECT split, lang, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM split GROUP BY split, lang""".stripMargin
    })(
      (s, d) => {
        import graft.Tables
        import graft.ops.TextOps.h32
        import org.apache.spark.sql.functions._
        // the battery passes lang/text through, so the quality gate is
        // the same single scan — no self-join on doc_id. Persisted:
        // the exact-dedup self-join (keepers probe + kept side) would
        // otherwise run the 5-gram battery twice. BOTH content hashes
        // (dedup md5, split h32) are computed in the same pre-persist
        // projection, so the cached frame holds 2 small hashes instead
        // of the full text and no branch ever re-hashes it
        val quality = TextQueries.qualityFlags(s, d)
          .where(col("keep"))
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            md5(col("text")).as("mh"),
            pmod(h32(col("text")), lit(100L)).as("bucket"))
          .persist()
        val keepers = quality
          .groupBy(col("mh"))
          .agg(min(col("doc_id")).as("keeper"))
        val deduped = quality
          .join(keepers, Seq("mh"))
          .where(col("doc_id") === col("keeper"))
        deduped
          .withColumn("split",
            when(col("bucket") < 80, "train")
              .when(col("bucket") < 90, "val")
              .otherwise("test"))
          .groupBy(col("split"), col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            min(col("doc_id")).as("min_doc"),
            max(col("doc_id")).as("max_doc"))
      }),

    // ---- corpus EXPORT pipeline e2e: the full release recipe as one
    // oracled DAG — quality battery → exact dedup → eval-set
    // decontamination (strict: drop any doc sharing a 5-token hash
    // window with the held-out split) → largest-remainder language
    // mixing (200-doc export budget apportioned over clean
    // availability) → deterministic token packing (cumulative-token
    // bins of 2000 per language, prefix selection so the cumsum over
    // clean docs IS the cumsum over selected docs) → per (lang, bin)
    // shard manifest with order-independent h32-sum checksums (the
    // q_migrate_checksum reconciliation shape).
    // Scale: quality is a shuffle-free scan; dedup one hash groupBy;
    // decontamination an inverted-index join against a BROADCAST eval
    // index; apportionment a |langs|-row frame; rank/cumsum via the
    // two-phase sharded pattern (per-(lang,shard) windows + broadcast
    // per-shard offsets — never a per-lang global sort); manifest a
    // |langs×bins| aggregate. The oracle replays the identical
    // integer arithmetic with plain per-lang windows, feasible at
    // gate scale. ----
    QueryDef("q_corpus_export_e2e", Some {
      import graft.ops.TextOps.{h32Sql, tokensSql, shinglesSql, shingleHashesSql}
      val docTokE2e = "concat_ws('|', CAST(doc_id AS VARCHAR), CAST(n_tokens AS VARCHAR))"
      s"""WITH ${TextQueries.qualityCteSql},
         |quality AS (
         |  SELECT doc_id, lang, text, n_tokens FROM qflags WHERE keep),
         |keepers AS (
         |  SELECT md5(text) AS h, min(doc_id) AS keeper
         |  FROM quality GROUP BY md5(text)),
         |dd AS (
         |  SELECT q.doc_id, q.lang, q.text, q.n_tokens FROM quality q
         |  JOIN keepers k ON md5(q.text) = k.h AND q.doc_id = k.keeper),
         |evx AS (
         |  SELECT DISTINCT unnest(list_distinct(${shingleHashesSql("g")})) AS h
         |  FROM (SELECT ${shinglesSql("w", 5)} AS g
         |        FROM (SELECT text, ${tokensSql("text")} AS w FROM documents
         |              WHERE ${h32Sql("text")} % 100 >= 95))),
         |tr AS (
         |  SELECT doc_id, lang, n_tokens,
         |    list_distinct(${shingleHashesSql(shinglesSql("w", 5))}) AS shw
         |  FROM (SELECT dd.*, ${tokensSql("text")} AS w FROM dd
         |        WHERE ${h32Sql("text")} % 100 < 95)),
         |hits AS (
         |  SELECT DISTINCT t.doc_id
         |  FROM (SELECT doc_id, unnest(shw) AS h FROM tr) t
         |  JOIN evx ON t.h = evx.h),
         |clean AS (
         |  SELECT doc_id, lang, n_tokens FROM tr
         |  WHERE doc_id NOT IN (SELECT doc_id FROM hits)),
         |a AS (SELECT lang, CAST(count(*) AS BIGINT) AS cnt
         |      FROM clean GROUP BY lang),
         |q2 AS (SELECT lang, cnt, $exportDocs * cnt AS num,
         |         CAST(sum(cnt) OVER () AS BIGINT) AS tw FROM a),
         |b AS (SELECT lang, CAST(floor(num / tw) AS BIGINT) AS base,
         |        (num % tw) AS rem FROM q2),
         |b2 AS (SELECT lang, base, rem,
         |         CAST($exportDocs - sum(base) OVER () AS BIGINT) AS k,
         |         row_number() OVER (ORDER BY rem DESC, lang) AS rnk FROM b),
         |alloc AS (SELECT lang,
         |            base + CASE WHEN rnk <= k THEN 1 ELSE 0 END AS alloc
         |          FROM b2),
         |r AS (
         |  SELECT clean.*,
         |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
         |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang
         |      ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS tok_before
         |  FROM clean),
         |sel AS (
         |  SELECT r.*, tok_before // $exportPackBudget AS bin
         |  FROM r JOIN alloc ON r.lang = alloc.lang
         |  WHERE rn <= alloc.alloc)
         |SELECT lang, bin, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(sum(${h32Sql(docTokE2e)}) AS BIGINT) AS digest,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM sel GROUP BY lang, bin""".stripMargin
    })(
      (s, d) => {
        import graft.Tables
        import graft.functions.GraftFunctions
        import graft.ops.TextOps
        import graft.ops.TextOps.{h32, tokens}
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions._
        // persisted: the stage DAG re-reads each hot frame on several
        // branches (keepers self-join; tr feeds both the contamination
        // probe and the anti-join; clean feeds the apportionment AND
        // the sharded rank/cumsum) — without materialization every
        // branch re-runs the full 5-gram battery upstream. The battery
        // already tokenized every doc (keepTokens reuses its `w`), so
        // the 5-gram hash windows, the dedup md5 and the split bucket
        // are ALL computed in the one pre-persist projection: the
        // cached frame holds hashes, never text, and no branch
        // re-tokenizes
        val quality = TextQueries.qualityFlags(s, d, keepTokens = true)
          .where(col("keep"))
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            md5(col("text")).as("mh"),
            pmod(h32(col("text")), lit(100L)).as("bucket"),
            array_distinct(
              GraftFunctions.shingleHashes(col("w"), 5, TextOps.P)).as("shw"))
          .persist()
        val keepers = quality
          .groupBy(col("mh"))
          .agg(min(col("doc_id")).as("keeper"))
        val dd = quality
          .join(keepers, Seq("mh"))
          .where(col("doc_id") === col("keeper"))
        // held-out split's window index — small by contract, broadcast
        // (over ALL documents incl. quality-dropped, per the recipe)
        val evIdx = Tables(s, d, "documents")
          .where(pmod(h32(col("text")), lit(100L)) >= 95)
          .select(explode(array_distinct(
            GraftFunctions.shingleHashes(tokens(col("text")), 5, TextOps.P)))
            .as("h"))
          .distinct()
        val tr = dd.where(col("bucket") < 95)
          .select(col("doc_id"), col("lang"), col("n_tokens"), col("shw"))
          .persist()
        val hits = tr
          .select(col("doc_id"), explode(col("shw")).as("h"))
          .join(broadcast(evIdx), Seq("h"))
          .select(col("doc_id")).distinct()
        val clean = tr.join(hits, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("lang"), col("n_tokens"))
          .persist()
        // largest-remainder apportionment over a |langs|-row frame
        val wAll = graft.ops.BoundedWindow.all()
        val a = clean.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
        val q2 = a.select(col("lang"),
          (lit(exportDocs.toLong) * col("cnt")).as("num"),
          sum(col("cnt")).over(wAll).as("tw"))
        val b = q2.select(col("lang"),
          expr("CAST(floor(num / tw) AS BIGINT)").as("base"),
          (col("num") % col("tw")).as("rem"))
        val b2 = b.select(col("lang"), col("base"),
          (lit(exportDocs.toLong) - sum(col("base")).over(wAll)).as("k"),
          row_number().over(
            graft.ops.BoundedWindow.ordered(col("rem").desc, col("lang")))
            .as("rnk"))
        val alloc = b2.select(col("lang"),
          (col("base") + when(col("rnk") <= col("k"), 1L).otherwise(0L))
            .as("alloc"))
        // two-phase sharded rank + token cumsum: per-(lang,shard)
        // windows, per-shard offsets broadcast back — never a global
        // per-lang sort
        val sharded = clean.withColumn("shard",
          expr(s"doc_id DIV $exportShardWidth"))
        val per = sharded.groupBy(col("lang"), col("shard"))
          .agg(count(lit(1)).as("s_cnt"), sum(col("n_tokens")).as("s_tok"))
        val wLang = Window.partitionBy(col("lang")).orderBy(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = per.select(col("lang"), col("shard"),
          coalesce(sum(col("s_cnt")).over(wLang), lit(0L)).as("cnt_off"),
          coalesce(sum(col("s_tok")).over(wLang), lit(0L)).as("tok_off"))
        val wLoc = Window.partitionBy(col("lang"), col("shard"))
          .orderBy(col("doc_id"))
        val ranked = sharded
          .withColumn("local_rn", row_number().over(wLoc))
          .withColumn("local_tb", coalesce(sum(col("n_tokens"))
            .over(wLoc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .join(broadcast(offsets), Seq("lang", "shard"))
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            (col("cnt_off") + col("local_rn")).as("rn"),
            (col("tok_off") + col("local_tb")).as("tok_before"))
        val sel = ranked.join(broadcast(alloc), Seq("lang"))
          .where(col("rn") <= col("alloc"))
          .withColumn("bin", expr(s"tok_before DIV $exportPackBudget"))
        sel.groupBy(col("lang"), col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("bigint").as("total_tokens"),
            sum(h32(concat_ws("|", col("doc_id").cast("string"),
              col("n_tokens").cast("string")))).cast("bigint").as("digest"),
            min(col("doc_id")).as("min_doc"),
            max(col("doc_id")).as("max_doc"))
      })
  )
}
