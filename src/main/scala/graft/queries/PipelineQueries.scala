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
      })
  )
}
