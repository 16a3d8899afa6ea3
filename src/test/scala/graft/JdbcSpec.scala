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
}
