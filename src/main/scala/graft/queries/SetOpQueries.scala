package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Set-operation surface: UNION ALL / UNION DISTINCT / INTERSECT / EXCEPT
  * (SURVEY.md §2.4). Spark resolves by position (`union`), so both sides
  * are projected to identical shapes first.
  */
object SetOpQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_union_all", Some(
      """SELECT c_custkey AS id, c_name AS name, 'customer' AS kind
        |FROM customer WHERE c_nationkey < 5
        |UNION ALL
        |SELECT s_suppkey AS id, s_name AS name, 'supplier' AS kind
        |FROM supplier WHERE s_nationkey < 5""".stripMargin))(
      (s, d) => {
        val c = Tables(s, d, "customer").where(col("c_nationkey") < 5)
          .select(col("c_custkey").as("id"), col("c_name").as("name"),
            lit("customer").as("kind"))
        val su = Tables(s, d, "supplier").where(col("s_nationkey") < 5)
          .select(col("s_suppkey").as("id"), col("s_name").as("name"),
            lit("supplier").as("kind"))
        c.union(su)
      }),

    QueryDef("q_union_distinct", Some(
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin))(
      (s, d) =>
        Tables(s, d, "customer").select(col("c_nationkey").as("nationkey"))
          .union(Tables(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
          .distinct()),

    // Custkeys that both placed an urgent order and a low-priority order.
    QueryDef("q_intersect", Some(
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'""".stripMargin))(
      (s, d) => {
        val o = Tables(s, d, "orders")
        o.where(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("custkey"))
          .intersect(o.where(col("o_orderpriority") === "5-LOW")
            .select(col("o_custkey").as("custkey")))
      }),

    // Customers who ordered, minus those with any finished order.
    QueryDef("q_except", Some(
      """SELECT o_custkey AS custkey FROM orders
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin))(
      (s, d) => {
        val o = Tables(s, d, "orders")
        o.select(col("o_custkey").as("custkey"))
          .except(o.where(col("o_orderstatus") === "F")
            .select(col("o_custkey").as("custkey")))
      }),

    // ---- unionByName with missing-column fill: two extracts whose
    // schemas diverged (the legacy feed lacks `cents`, the current
    // feed lacks `qty`) are reconciled BY NAME with
    // allowMissingColumns = true — absent columns NULL-fill, and
    // matching names align regardless of position (a positional UNION
    // here would silently pair qty with cents). The in-flight twin of
    // the q_schema_evolution at-rest mergeSchema read. The oracle
    // models the same reconciliation with explicit NULL columns. The
    // aggregate pins both the fill (per-side sums survive) and the
    // alignment (a column swap would move mass between sum_qty and
    // sum_cents). Scale: union is a no-shuffle plan node; the agg is
    // one partial+final. ----
    QueryDef("q_union_by_name", Some(
      """WITH u AS (
        |  SELECT l_orderkey AS okey,
        |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
        |    CAST(NULL AS BIGINT) AS cents
        |  FROM lineitem WHERE l_linenumber = 1
        |  UNION ALL
        |  SELECT l_orderkey AS okey, CAST(NULL AS BIGINT) AS qty,
        |    CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem WHERE l_linenumber = 2)
        |SELECT okey % 5 AS bucket, count(*) AS n_rows,
        |  CAST(count(qty) AS BIGINT) AS n_qty,
        |  CAST(count(cents) AS BIGINT) AS n_cents,
        |  CAST(sum(qty) AS BIGINT) AS sum_qty,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM u GROUP BY okey % 5""".stripMargin))(
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        val legacy = li.where(col("l_linenumber") === 1)
          .select(col("l_orderkey").as("okey"),
            floor(col("l_quantity") + 0.5).cast("bigint").as("qty"))
        val current = li.where(col("l_linenumber") === 2)
          .select(col("l_orderkey").as("okey"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("bigint")
              .as("cents"))
        legacy.unionByName(current, allowMissingColumns = true)
          .groupBy((col("okey") % 5).as("bucket"))
          .agg(count(lit(1)).as("n_rows"),
            count(col("qty")).cast("bigint").as("n_qty"),
            count(col("cents")).cast("bigint").as("n_cents"),
            sum(col("qty")).cast("bigint").as("sum_qty"),
            sum(col("cents")).cast("bigint").as("sum_cents"))
      })
  )
}
