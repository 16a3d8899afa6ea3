package graft

import graft.ops.Relational
import graft.pipeline.{JobSpec, Pipeline, SourceSpec}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** C11 — the job-driver CLI, the engine's equivalent of the
  * reference's `python migrator.py config.json` entry point
  * (verizon_table_migration_Rakesh_filters.py:424-448): parse the JSON
  * job spec, build one SparkSession, run every table through the
  * 3-phase resumable [[graft.pipeline.Pipeline]] under the workspace
  * lease, then release the session.
  *
  * Usage: `graft.Main <config.json> [workspace] [inputDir]`
  *  - `workspace` overrides the spec's workspace (staging/checkpoint/
  *    target root) — configs can ship with a placeholder.
  *  - `inputDir` is the default source root: source `name` resolves to
  *    `<inputDir>/<name>.parquet` unless the spec gives an explicit
  *    per-source `path`. (The reference reads sources over JDBC;
  *    `Relational.scanJdbc` is the drop-in hook for callers embedding
  *    the pipeline against a database — the CLI default is the parquet
  *    lake.)
  */
object Main {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Main <config.json> [workspace] [inputDir]")
    val json = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0))), "UTF-8")
    val parsed = JobSpec.fromJson(json)
    val spec = args.lift(1).filter(_.nonEmpty)
      .map(ws => parsed.copy(workspace = ws)).getOrElse(parsed)
    val inputDir = args.lift(2)

    // sink selection + validation, BEFORE any session or filesystem
    // work — the reference hardcodes its Cassandra target (py:347-353);
    // here the config decides, and a misdeclared contract (typo'd
    // clustering column, key missing from a table's projection) must
    // fail fast, not after a full load commits an unreadable table.
    // The actual contract DECLARATION happens per table through the
    // pipeline's prepareTarget hook — i.e. under the workspace lease,
    // with the session's Hadoop configuration
    // each projection entry's OUTPUT column name, via the real
    // expression parser (string surgery on " AS " misparses unaliased
    // casts — "CAST(x AS BIGINT)" is not an alias): an Alias yields
    // its name, a bare (possibly qualified) column reference its last
    // part, and any other unaliased expression its SQL text — which
    // can never equal a key column name, so a computed sink key
    // without an explicit alias fails fast with the expression quoted
    def outputCols(t: graft.pipeline.TableSpec): Seq[String] =
      t.transformedColumns.map { e =>
        org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseExpression(e) match {
          case a: org.apache.spark.sql.catalyst.expressions.Alias => a.name
          case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            ua.nameParts.last
          case other => other.sql
        }
      }
    val (sink, prepare, finish): (graft.pipeline.AppendSink,
        graft.pipeline.TableSpec => Unit,
        graft.pipeline.TableSpec => Unit) = spec.sink match {
      case None | Some(graft.pipeline.SinkSpec("parquet", _, _, _, _)) =>
        (graft.pipeline.ParquetAppendSink, _ => (), _ => ())
      case Some(s @ graft.pipeline.SinkSpec(
          t @ ("keyedTable" | "keyedTableIdempotent"), _, _, _, _)) =>
        val key = s.key.getOrElse(throw new IllegalArgumentException(
          s"sink type '$t' requires a 'key' column"))
        val clustering = s.clustering
          .map(graft.sources.KeyedTableOps.parseClustering)
          .getOrElse(Seq.empty)
        require(!clustering.contains(key),
          s"sink clustering $clustering must not repeat the key '$key'")
        spec.tables.foreach { tb =>
          val cols = outputCols(tb)
          (key +: clustering).foreach(c => require(cols.contains(c),
            s"table ${tb.targetTable}: sink primary-key column '$c' is " +
              s"not among its projected columns ${cols.mkString(", ")}"))
        }
        val snk =
          if (t == "keyedTable")
            graft.pipeline.V2KeyedTableSink(key, s.writePartitions)
          else graft.pipeline.V2IdempotentKeyedTableSink(key,
            s.writePartitions)
        val fin: graft.pipeline.TableSpec => Unit =
          if (!s.autoCompact) _ => ()
          else tb => {
            // stats-driven maintenance as part of the job (still under
            // the workspace lease): a metadata-only decision; folds
            // when the load wave left the target fragmented, no-ops
            // otherwise
            val sess = SparkSession.active
            graft.sources.KeyedTableOps.maybeCompact(sess,
              spec.targetDir(tb.targetTable))
            ()
          }
        (snk, tb => graft.sources.KeyedTableOps.declareTable(
          spec.targetDir(tb.targetTable), key, s.writePartitions,
          clustering), fin)
      case Some(other) => throw new IllegalArgumentException(
        s"unknown sink type '${other.`type`}' (parquet | keyedTable | " +
          "keyedTableIdempotent)")
    }

    // reuse a live session (embedded callers, tests); otherwise build
    // one — master comes from spark-submit when present, local[*] when
    // launched bare
    val hadSession =
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).isDefined
    val builder = SparkSession.builder()
      .appName("graft-migrate")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    if (!hadSession && sys.props.get("spark.master").isEmpty)
      builder.master("local[*]")
    val spark = builder.getOrCreate()

    // resolution order per source: explicit parquet path → JDBC table
    // (job-level connection, the reference's Oracle path) → the
    // inputDir parquet lake
    val source: SourceSpec => DataFrame = s2 => (s2.path, s2.jdbcTable) match {
      case (Some(p), _) => Relational.scanParquet(spark, p)
      case (None, Some(tbl)) =>
        val conn = spec.jdbc.getOrElse(throw new IllegalArgumentException(
          s"source ${s2.name}: jdbcTable '$tbl' requires a job-level jdbc block"))
        val part = s2.jdbcPartitionColumn.map(c => Relational.JdbcPartition(
          c, s2.jdbcLowerBound, s2.jdbcUpperBound, s2.numPartitions))
        Relational.scanJdbc(spark, Relational.JdbcScan(conn.url, tbl,
          conn.user, conn.password, conn.driver, conn.fetchSize, part))
      case (None, None) =>
        val p = inputDir.map(d => s"$d/${s2.name}.parquet")
          .getOrElse(throw new IllegalArgumentException(
            s"source ${s2.name}: no per-source path/jdbcTable and no inputDir argument"))
        Relational.scanParquet(spark, p)
    }

    try new Pipeline(spark, spec, source, sink, prepareTarget = prepare,
      finishTarget = finish).runAll()
    finally if (!hadSession) spark.stop() // py:446 — driver owns the session
  }
}
