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

    // reuse a live session (embedded callers, tests); otherwise build
    // one — master comes from spark-submit when present, local[*] when
    // launched bare
    val hadSession =
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).isDefined
    val builder = SparkSession.builder()
      .appName("graft-migrate")
      .config("spark.sql.session.timeZone", "UTC")
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

    // sink selection from the spec — the reference hardcodes its
    // Cassandra target (py:347-353); here the config decides, and the
    // keyed-table choices carry the full Cassandra model (upsert
    // reads, tombstone deletes, compaction, TTL) on the target dirs
    val sink: graft.pipeline.AppendSink = spec.sink match {
      case None => graft.pipeline.ParquetAppendSink
      case Some(s) => s.`type` match {
        case "parquet" => graft.pipeline.ParquetAppendSink
        case t @ ("keyedTable" | "keyedTableIdempotent") =>
          val key = s.key.getOrElse(throw new IllegalArgumentException(
            s"sink type '$t' requires a 'key' column"))
          // declare the composite primary key BEFORE any write so the
          // first latest view / compaction already resolves correctly
          s.clustering.map(_.split(",").toSeq.map(_.trim)
              .filter(_.nonEmpty)).filter(_.nonEmpty)
            .foreach { cols =>
              spec.tables.foreach(t2 => graft.sources.KeyedTableOps
                .declareClustering(spec.targetDir(t2.targetTable), cols))
            }
          if (t == "keyedTable")
            graft.pipeline.V2KeyedTableSink(key, s.writePartitions)
          else graft.pipeline.V2IdempotentKeyedTableSink(key,
            s.writePartitions)
        case other => throw new IllegalArgumentException(
          s"unknown sink type '$other' (parquet | keyedTable | " +
            "keyedTableIdempotent)")
      }
    }

    try new Pipeline(spark, spec, source, sink).runAll()
    finally if (!hadSession) spark.stop() // py:446 — driver owns the session
  }
}
