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

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_pipeline_e2e", Some(oracle))(
      (s, d) => {
        // Fresh workspace per invocation: the query checks the happy
        // path end-to-end; resume/skip semantics are covered by
        // PipelineSpec (kill-and-resume on a pre-seeded workspace).
        val ws = Files.createTempDirectory("graft_pipeline_").toString
        val sp = spec(ws)
        new Pipeline(s, sp,
          src => Relational.scanParquet(s, s"$d/${src.name}.parquet"),
          retryInitialDelayMs = 50).runAll()
        Relational.scanParquet(s, sp.targetDir("enriched_lineitem"))
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
        // the same single scan — no self-join on doc_id
        val quality = TextQueries.qualityFlags(s, d)
          .where(col("keep"))
          .select(col("doc_id"), col("lang"), col("text"), col("n_tokens"))
        val keepers = quality
          .groupBy(md5(col("text")).as("h"))
          .agg(min(col("doc_id")).as("keeper"))
        val deduped = quality
          .join(keepers, md5(col("text")) === col("h")
            && col("doc_id") === col("keeper"))
        val bucket = pmod(h32(col("text")), lit(100L))
        deduped
          .withColumn("split",
            when(bucket < 80, "train").when(bucket < 90, "val")
              .otherwise("test"))
          .groupBy(col("split"), col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            min(col("doc_id")).as("min_doc"),
            max(col("doc_id")).as("max_doc"))
      })
  )
}
