package graft

import graft.ops.Relational
import graft.ops.Relational.{JdbcPartition, JdbcScan}
import java.sql.DriverManager

/** Real JDBC source tests (S1/S2 — the reference's primary source,
  * py:93-130) against an in-memory Derby database (ships on Spark's
  * classpath): plain scan, range-partitioned parallel scan (one task
  * per stripe), and predicate pushdown through the JDBC relation. */
class JdbcSpec extends SparkSpecBase {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  override def beforeAll(): Unit = {
    super.beforeAll()
    Class.forName(driver)
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    try st.execute("DROP TABLE nation") catch { case _: Throwable => () }
    st.execute(
      "CREATE TABLE nation (n_nationkey BIGINT, n_name VARCHAR(64), n_regionkey BIGINT)")
    val rows = Tables(spark, sfDir, "nation")
      .selectExpr("CAST(n_nationkey AS LONG)", "n_name", "CAST(n_regionkey AS LONG)")
      .collect()
    val ps = conn.prepareStatement("INSERT INTO nation VALUES (?, ?, ?)")
    rows.foreach { r =>
      ps.setLong(1, r.getLong(0)); ps.setString(2, r.getString(1))
      ps.setLong(3, r.getLong(2)); ps.addBatch()
    }
    ps.executeBatch()
    conn.close()
  }

  private def fixture =
    Tables(spark, sfDir, "nation")
      .selectExpr("CAST(n_nationkey AS LONG)", "n_name", "CAST(n_regionkey AS LONG)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("plain JDBC scan reads the whole table with inferred schema") {
    val df = Relational.scanJdbc(spark, JdbcScan(url, "nation", driver = driver))
    val got = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === fixture)
  }

  test("range-partitioned scan: one partition per stripe, same data") {
    val df = Relational.scanJdbc(spark, JdbcScan(url, "nation", driver = driver,
      partition = Some(JdbcPartition("n_nationkey", 0, 25, 4))))
    assert(df.rdd.getNumPartitions === 4)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === fixture)
  }

  test("SQL-string filter pushes into the JDBC relation") {
    val df = Relational.filterSql(
      Relational.scanJdbc(spark, JdbcScan(url, "nation", driver = driver)),
      "n_nationkey >= 10 AND n_name LIKE 'NATION%'")
    assert(df.count() === fixture.count(_._1 >= 10))
    val pushed = df.queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters") &&
      pushed.contains("GreaterThanOrEqual(N_NATIONKEY,10)"),
      s"filter not pushed down:\n$pushed")
  }

  test("DECIMAL fidelity: customSchema pins the type, normalize casts it, " +
      "staged parquet preserves both (SURVEY §1.4 Oracle NUMBER risk)") {
    // Oracle NUMBER lands as DECIMAL(38,10); Derby caps precision at 31,
    // so the table ships DECIMAL(31,10) and customSchema exercises the
    // same read-side override an Oracle user applies for (38,10)
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    try st.execute("DROP TABLE acct") catch { case _: Throwable => () }
    st.execute("CREATE TABLE acct (objid DECIMAL(31,10), bal DECIMAL(31,10))")
    st.execute("INSERT INTO acct VALUES " +
      "(268435455, 1234.5000000001), (12345678901234567, -0.0000000001), (7, 0)")
    conn.close()

    // default mapping: exact DecimalType(31,10), values bit-exact
    val plain = Relational.scanJdbc(spark, JdbcScan(url, "acct", driver = driver))
    assert(plain.schema("OBJID").dataType ===
      org.apache.spark.sql.types.DecimalType(31, 10))
    assert(plain.selectExpr("sum(bal)").first().getDecimal(0)
      .compareTo(new java.math.BigDecimal("1234.5000000000")) == 0)

    // customSchema: the Spark-side type is the DECLARED one, and the
    // staged parquet round-trips it exactly (type + values)
    val pinned = Relational.scanJdbc(spark, JdbcScan(url, "acct",
      driver = driver, customSchema = "OBJID DECIMAL(38,0), BAL DECIMAL(38,10)"))
    assert(pinned.schema("OBJID").dataType ===
      org.apache.spark.sql.types.DecimalType(38, 0))
    assert(pinned.schema("BAL").dataType ===
      org.apache.spark.sql.types.DecimalType(38, 10))
    val staged = java.nio.file.Files
      .createTempDirectory("graft_jdbc_dec_").toString + "/acct"
    Relational.sinkParquet(pinned, staged)
    val back = spark.read.parquet(staged)
    assert(back.schema("OBJID").dataType ===
      org.apache.spark.sql.types.DecimalType(38, 0))
    assert(back.schema("BAL").dataType ===
      org.apache.spark.sql.types.DecimalType(38, 10))
    assert(back.selectExpr("cast(sum(objid) AS STRING)").first().getString(0)
      === "12345679169670029")
    assert(back.where("bal = CAST('-0.0000000001' AS DECIMAL(38,10))").count() === 1)

    // decimalNormalize="bigint" scoped to OBJID: the integral key
    // stages as int64 (the reference's objid bound checks) while the
    // genuinely-fractional BAL keeps its exact decimal type — the
    // column list exists precisely so one integral key doesn't drag
    // every decimal in the row through a lossy cast
    val norm = Relational.scanJdbc(spark, JdbcScan(url, "acct",
      driver = driver, customSchema = "OBJID DECIMAL(38,0)",
      decimalNormalize = "bigint", decimalNormalizeCols = Seq("objid")))
    assert(norm.schema("OBJID").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(norm.schema("BAL").dataType ===
      org.apache.spark.sql.types.DecimalType(31, 10))
    assert(norm.selectExpr("sum(objid)").first().getLong(0) ===
      268435455L + 12345678901234567L + 7L)

    // a LOSSY bigint normalize fails loudly instead of truncating:
    // BAL holds 1234.5000000001, whose fractional part a silent cast
    // would destroy — the migration must stop, not corrupt
    val lossy = Relational.scanJdbc(spark, JdbcScan(url, "acct",
      driver = driver, decimalNormalize = "bigint",
      decimalNormalizeCols = Seq("bal")))
    val e = intercept[Exception](lossy.collect())
    assert(e.getMessage.contains("lossy for BAL"),
      s"expected loud lossy-cast failure, got: ${e.getMessage}")

    // a column list naming a column the scan doesn't have is a
    // config typo — reject it up front
    intercept[IllegalArgumentException](Relational.scanJdbc(spark,
      JdbcScan(url, "acct", driver = driver,
        decimalNormalize = "bigint", decimalNormalizeCols = Seq("nope"))))

    // a column list naming an existing but NON-decimal column (e.g.
    // customSchema already mapped it to DOUBLE) would silently
    // normalize nothing — the user's stated intent must not be a no-op
    intercept[IllegalArgumentException](Relational.scanJdbc(spark,
      JdbcScan(url, "acct", driver = driver,
        customSchema = "OBJID DOUBLE",
        decimalNormalize = "bigint", decimalNormalizeCols = Seq("objid"))))

    // a column list WITHOUT a target type is a config contradiction —
    // reject instead of silently ignoring the list
    intercept[IllegalArgumentException](Relational.scanJdbc(spark,
      JdbcScan(url, "acct", driver = driver,
        decimalNormalizeCols = Seq("objid"))))
  }

  test("JDBC sink round-trip: write back, then scan equals the source") {
    val src = Tables(spark, sfDir, "nation")
      .selectExpr("CAST(n_nationkey AS LONG) AS n_nationkey", "n_name",
        "CAST(n_regionkey AS LONG) AS n_regionkey")
    Relational.sinkJdbc(src, url, "nation_out",
      mode = "overwrite", driver = driver, numPartitions = 2)
    val back = Relational.scanJdbc(spark, JdbcScan(url, "nation_out", driver = driver))
    val got = back.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === fixture)
    // append mode doubles the rows (at-least-once, like the reference's sink)
    Relational.sinkJdbc(src, url, "nation_out", driver = driver, numPartitions = 2)
    assert(Relational.scanJdbc(spark,
      JdbcScan(url, "nation_out", driver = driver)).count() === 2L * fixture.size)
  }

  test("pipeline round-trip through the JDBC sink seam: the full 3-phase " +
      "job loads a relational target, resumable checkpoints included") {
    import graft.pipeline.{JdbcAppendSink, ParquetAppendSink, Pipeline}
    def ws() = java.nio.file.Files.createTempDirectory("graft_jdbc_pipe_")
      .toString
    def run(sink: graft.pipeline.AppendSink): graft.pipeline.JobSpec = {
      val sp = graft.queries.PipelineQueries.spec(ws())
      new Pipeline(spark, sp,
        s2 => Relational.scanParquet(spark, s"$sfDir/${s2.name}.parquet"),
        sink = sink, retryInitialDelayMs = 1).runAll()
      sp
    }
    // truth: the identical job into the default parquet sink
    val truthSpec = run(ParquetAppendSink)
    val truth = spark.read.parquet(truthSpec.targetDir("enriched_lineitem"))
    run(JdbcAppendSink(url, "enriched_out", driver, numPartitions = 2))
    val back0 = Relational.scanJdbc(spark,
      JdbcScan(url, "enriched_out", driver = driver))
    val back = back0.toDF(back0.columns.map(_.toLowerCase): _*)
    assert(back.count() === truth.count())
    // value-level: the (order_id, line_no, qty) set survives the trip
    val key = Seq("order_id", "line_no", "qty").map(org.apache.spark.sql
      .functions.col)
    assert(back.select(key: _*).except(truth.select(key: _*)).isEmpty &&
      truth.select(key: _*).except(back.select(key: _*)).isEmpty)
  }
}
