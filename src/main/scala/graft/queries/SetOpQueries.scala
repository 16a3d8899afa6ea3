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
      })
  )
}
