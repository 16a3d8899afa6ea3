package graft.pipeline

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Declarative job spec — the engine's "query language", mirroring the
  * reference's JSON config (verizon_table_migration_Rakesh_filters
  * .json:27-84): per target table, N filtered sources, a join graph,
  * and config-supplied projection expressions. Parsed with Jackson
  * (ships on Spark's classpath — no extra dependency).
  */
/** Job-level database connection — the reference's Oracle block
  * (config json: one connection shared by every source table). */
final case class JdbcConnSpec(
    url: String,
    driver: String = "",
    user: String = "",
    password: String = "",
    fetchSize: Int = 10000)

final case class SourceSpec(
    name: String,
    /** SQL predicate pushed into the source scan (json:53-58). */
    filter: Option[String] = None,
    /** Override path; default `<inputDir>/<name>.parquet`. */
    path: Option[String] = None,
    /** Read over JDBC (table name or `(subquery) alias`) through the
      * job-level [[JobSpec.jdbc]] connection — the reference's source
      * path (py:96-132). Takes precedence over the parquet lake,
      * is overridden by an explicit `path`. */
    jdbcTable: Option[String] = None,
    /** Range-partitioned parallel read (py:118-126): stripe the scan
      * on this column across `numPartitions` JDBC sessions. */
    jdbcPartitionColumn: Option[String] = None,
    jdbcLowerBound: Long = 0L,
    jdbcUpperBound: Long = 0L,
    /** Staging write parallelism (py:190, default 10 → fixture-sized). */
    numPartitions: Int = 4,
    /** Stage bucketed by this column: the phase-2 join on it (and any
      * resume re-run) reads co-located buckets and plans with NO
      * Exchange — the shuffle is paid once at staging time. Absent =
      * plain parquet staging, shuffle at join time (the reference's
      * behavior). */
    bucketKey: Option[String] = None,
    /** Bucket count when bucketKey is set (match across join sides). */
    numBuckets: Int = 4)

final case class JoinSpec(
    rightTable: String,
    leftCol: String,
    rightCol: String,
    joinType: String = "inner")

final case class TableSpec(
    targetTable: String,
    sources: Seq[SourceSpec],
    /** Join-graph root (the reference's first-aliased table, py:135). */
    root: String,
    joins: Seq[JoinSpec],
    /** `selectExpr` strings (py:146, json:59-82). */
    transformedColumns: Seq[String],
    numPartitions: Int = 4)

/** Job-level SINK selection — the config's rendering of the
  * reference's target store choice (it hardcodes the Cassandra
  * connector, py:347-353; here the same decision lives in the spec).
  * `type`: "parquet" (default), "keyedTable" (the V2 keyed-append
  * table — Cassandra-model upserts, requires `key`), or
  * "keyedTableIdempotent" (same table through named per-source-file
  * commits: a resume's re-append is a sink-level no-op).
  * `clustering` declares the non-partition primary-key columns so
  * latest views and compaction resolve per full key. */
final case class SinkSpec(
    `type`: String = "parquet",
    key: Option[String] = None,
    writePartitions: Int = 8,
    clustering: Option[String] = None,
    /** Keyed-table sinks only: after each table's load completes
      * (still under the workspace lease), run the stats-driven
      * auto-compaction policy — a metadata-only decision that folds
      * the target when the live log has fragmented and is a cheap
      * no-op otherwise. */
    autoCompact: Boolean = false)

final case class JobSpec(
    /** Workspace root; raw/transformed/checkpoint conventions below it
      * (py:189/209/238 path conventions). */
    workspace: String,
    tables: Seq[TableSpec],
    /** Shared database connection for `jdbcTable` sources. */
    jdbc: Option[JdbcConnSpec] = None,
    /** Target sink; absent = parquet appends (the offline default). */
    sink: Option[SinkSpec] = None) {
  def rawDir(table: String): String = s"$workspace/raw/$table"
  def transformedDir(target: String): String = s"$workspace/transformed/$target"
  def checkpointDir(target: String): String = s"$workspace/checkpoints/$target"
  def targetDir(target: String): String = s"$workspace/target/$target"
}

object JobSpec {
  private lazy val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  def fromJson(json: String): JobSpec = mapper.readValue(json, classOf[JobSpec])

  def toJson(spec: JobSpec): String = mapper.writeValueAsString(spec)
}
