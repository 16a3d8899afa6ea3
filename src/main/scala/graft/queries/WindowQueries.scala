package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Window-function surface (SURVEY.md §2.4): ranking, analytic
  * (lag/lead), running frames (ROWS), value-range frames (RANGE), ntile,
  * and windowed top-k per group. Every ORDER BY carries a unique
  * tie-breaker so results are deterministic across engines.
  */
object WindowQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  val defs: Seq[QueryDef] = Seq(
    // Ranking trio per nation.
    QueryDef("q_window_rank", Some(
      """SELECT custkey, name, nationkey, rn, rnk, drnk FROM (
        |  SELECT c_custkey AS custkey, c_name AS name, c_nationkey AS nationkey,
        |    row_number() OVER w AS rn, rank() OVER w AS rnk,
        |    dense_rank() OVER w AS drnk
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey
        |               ORDER BY c_acctbal DESC, c_custkey)
        |) WHERE rn <= 3""".stripMargin))(
      (s, d) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        Tables(s, d, "customer")
          .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
            col("c_nationkey").as("nationkey"),
            row_number().over(w).cast("bigint").as("rn"),
            rank().over(w).cast("bigint").as("rnk"),
            dense_rank().over(w).cast("bigint").as("drnk"))
          .where(col("rn") <= 3)
      }),

    // Running (cumulative) aggregates per customer over order time.
    QueryDef("q_window_running", Some(
      """SELECT o_orderkey AS orderkey, o_custkey AS custkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS order_idx
        |FROM orders""".stripMargin), headline = true)(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        Tables(s, d, "orders")
          .select(col("o_orderkey").as("orderkey"), col("o_custkey").as("custkey"),
            sum(dec(col("o_totalprice")))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double").as("running_spend"),
            row_number().over(w).cast("bigint").as("order_idx"))
      }),

    // lag/lead: inter-shipment gaps per supplier, in exact microseconds.
    QueryDef("q_window_lag_lead", Some(
      """SELECT l_orderkey AS orderkey, l_linenumber AS lineno,
        |  l_suppkey AS suppkey,
        |  epoch_us(l_shipdate) - epoch_us(lag(l_shipdate, 1) OVER w) AS gap_prev_us,
        |  epoch_us(lead(l_shipdate, 1) OVER w) - epoch_us(l_shipdate) AS gap_next_us
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |             ORDER BY l_shipdate, l_orderkey, l_linenumber)""".stripMargin))(
      (s, d) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
            col("l_linenumber").asc)
        Tables(s, d, "lineitem")
          .select(col("l_orderkey").as("orderkey"),
            col("l_linenumber").as("lineno"), col("l_suppkey").as("suppkey"),
            (unix_micros(col("l_shipdate").cast("timestamp")) -
              unix_micros(lag(col("l_shipdate"), 1).over(w).cast("timestamp")))
              .as("gap_prev_us"),
            (unix_micros(lead(col("l_shipdate"), 1).over(w).cast("timestamp")) -
              unix_micros(col("l_shipdate").cast("timestamp"))).as("gap_next_us"))
      }),

    // RANGE frame over a numeric ordering column (peer-inclusive).
    QueryDef("q_window_range_frame", Some(
      """SELECT c_custkey AS custkey, c_nationkey AS nationkey,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
        |    OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
        |          RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_sum
        |FROM customer""".stripMargin))(
      (s, d) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal"))
          .rangeBetween(-1000, Window.currentRow)
        Tables(s, d, "customer")
          .select(col("c_custkey").as("custkey"),
            col("c_nationkey").as("nationkey"),
            sum(dec(col("c_acctbal"))).over(w).cast("double").as("near_sum"))
      }),

    // ntile bucketing over a total order — SIZE-ADAPTIVE: the frame is
    // counted first (a metadata-cheap job on the 2-column pruned scan)
    // and at/below the ShardedRank threshold the plain bounded window
    // runs; above it, the two-phase sharded rank (100-unit acctbal
    // bands are monotone in the DESC order and ≤ ~110 shards at ANY
    // scale factor, TPC-H acctbal range being fixed) keeps any single
    // sort task shard-sized. Exact integer NTILE arithmetic either
    // way — bit-identical to the window function; the oracle keeps
    // ntile().
    QueryDef("q_window_ntile", Some(
      """SELECT c_custkey AS custkey,
        |  ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
        |FROM customer""".stripMargin))(
      (s, d) => {
        val c = Tables(s, d, "customer")
          .select(col("c_custkey"), col("c_acctbal"))
        val (ranked, n) = graft.ops.ShardedRank.rowNumberAdaptive(c,
          Seq(floor(col("c_acctbal") / 100).cast("bigint")), Seq(true),
          Seq(col("c_acctbal").desc, col("c_custkey").asc), "rn")
        ranked.withColumn("n", lit(n))
          .select(col("c_custkey").as("custkey"),
            expr(graft.ops.ShardedRank.ntileSql("rn", "n", 4))
              .as("quartile"))
      }),

    // Global top-k (orderBy+limit — Spark plans TakeOrderedAndProject:
    // per-partition top-k then a k-row merge on the driver, no full sort).
    QueryDef("q_topk_global", Some(
      """SELECT o_orderkey AS orderkey, o_totalprice AS total
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin))(
      (s, d) =>
        Tables(s, d, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(20)
          .select(col("o_orderkey").as("orderkey"),
            col("o_totalprice").as("total"))),

    // Top-k per group via row_number (single shuffle on the group key).
    QueryDef("q_topk_per_group", Some(
      """SELECT rf, orderkey, lineno, price FROM (
        |  SELECT l_returnflag AS rf, l_orderkey AS orderkey,
        |    l_linenumber AS lineno, l_extendedprice AS price,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem
        |) WHERE rn <= 3""".stripMargin))(
      (s, d) => {
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
            col("l_linenumber").asc)
        Tables(s, d, "lineitem")
          .select(col("l_returnflag").as("rf"), col("l_orderkey").as("orderkey"),
            col("l_linenumber").as("lineno"),
            col("l_extendedprice").as("price"),
            row_number().over(w).as("rn"))
          .where(col("rn") <= 3)
          .drop("rn")
      }),

    // ---- per-group top-k WITH TIES: rank() ≤ k instead of
    // row_number() ≤ k — every row tying the kth value survives, so
    // the result is a well-defined SET even without a unique
    // tie-break key (the FETCH FIRST k ROWS WITH TIES semantics;
    // row_number's cut would pick an arbitrary subset of the tied
    // rows without one). p_size per brand ties heavily, making the
    // semantic difference visible: groups return more than k rows. ----
    QueryDef("q_topk_with_ties", Some(
      """SELECT brand, partkey, size, rnk FROM (
        |  SELECT p_brand AS brand, p_partkey AS partkey,
        |    CAST(p_size AS BIGINT) AS size,
        |    CAST(rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC)
        |      AS BIGINT) AS rnk
        |  FROM part
        |) WHERE rnk <= 3""".stripMargin))(
      (s, d) => {
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("p_size").desc)
        Tables(s, d, "part")
          .select(col("p_brand").as("brand"),
            col("p_partkey").as("partkey"),
            col("p_size").cast("bigint").as("size"),
            rank().over(w).cast("bigint").as("rnk"))
          .where(col("rnk") <= 3)
      }),

    // ---- distribution window functions: percent_rank + cume_dist per
    // segment. Both are ANSI-defined from integer rank/count — one
    // double division each, so values match the oracle exactly. ----
    QueryDef("q_window_percent_cume", Some(
      """SELECT c_custkey, c_mktsegment AS segment,
        |  percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS pr,
        |  cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS cd
        |FROM customer""".stripMargin))(
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").asc)
        Tables(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment").as("segment"),
            percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
      }),

    // ---- first_value / last_value with explicit frames. last_value
    // over the DEFAULT frame is the current row (the classic gotcha);
    // the full-partition frame is spelled out, and the order key is
    // made unique so both engines agree on every row. ----
    QueryDef("q_window_first_last", Some(
      """SELECT c_custkey, c_mktsegment AS segment, c_acctbal,
        |  first_value(c_acctbal) OVER w AS lowest_bal,
        |  last_value(c_acctbal) OVER w AS highest_bal
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |  ORDER BY c_acctbal, c_custkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin))(
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment").as("segment"),
            col("c_acctbal"),
            first(col("c_acctbal")).over(w).as("lowest_bal"),
            last(col("c_acctbal")).over(w).as("highest_bal"))
      }),

    // ---- nth_value over the full-partition frame: the runner-up
    // balance per segment on every row (the "second best" reporting
    // shape). Same explicit-frame discipline as first/last_value —
    // the DEFAULT frame stops at the current row, where nth_value(2)
    // would be NULL for the first row and the frame gotcha returns;
    // the order key is made unique so both engines agree. ----
    QueryDef("q_window_nth_value", Some(
      """SELECT c_custkey, c_mktsegment AS segment, c_acctbal,
        |  nth_value(c_acctbal, 2) OVER w AS second_highest
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |  ORDER BY c_acctbal DESC, c_custkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""
        .stripMargin))(
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment").as("segment"),
            col("c_acctbal"),
            nth_value(col("c_acctbal"), 2).over(w).as("second_highest"))
      }),

    // ---- Pareto frontier (skyline): per brand, the parts no other
    // part weakly dominates (price ≤, size ≥, at least one strict) —
    // the multi-objective shortlist operator (cheapest-per-capability
    // sweep). The Spark side is the O(n log n) plane-sweep as TWO
    // windows per brand: a row survives iff its size is strictly above
    // max(size) over all STRICTLY cheaper rows (RANGE … 1 PRECEDING on
    // integer cents — a ROWS frame would wrongly include price ties)
    // AND it has the max size within its own price point (equal-price,
    // larger-size rows dominate; equal-price equal-size duplicates
    // both survive, since neither dominates strictly). The oracle is
    // the O(n²) NOT-EXISTS dominance SPEC, so this entry differentially
    // tests algorithm against definition, not a rewrite against
    // itself. Scale: windows partition by brand — parallel across
    // brands, no global sort; for a frontier over a single giant group
    // shard the sweep by a price prefix and merge shard frontiers
    // (frontier size is tiny vs input). ----
    QueryDef("q_pareto_frontier", Some(
      """SELECT p.p_brand AS brand, p.p_partkey AS partkey,
        |  CAST(floor(p.p_retailprice*100 + 0.5) AS BIGINT) AS price_cents,
        |  CAST(p.p_size AS BIGINT) AS size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_brand = p.p_brand
        |    AND floor(q.p_retailprice*100 + 0.5)
        |        <= floor(p.p_retailprice*100 + 0.5)
        |    AND q.p_size >= p.p_size
        |    AND (floor(q.p_retailprice*100 + 0.5)
        |         < floor(p.p_retailprice*100 + 0.5)
        |         OR q.p_size > p.p_size))""".stripMargin))(
      (s, d) => {
        val p = Tables(s, d, "part").select(
          col("p_brand").as("brand"), col("p_partkey").as("partkey"),
          floor(col("p_retailprice") * 100 + 0.5).cast("bigint")
            .as("price_cents"),
          col("p_size").cast("bigint").as("size"))
        val wCheaper = Window.partitionBy(col("brand"))
          .orderBy(col("price_cents"))
          .rangeBetween(Window.unboundedPreceding, -1)
        val wSamePrice = Window.partitionBy(col("brand"), col("price_cents"))
        p.withColumn("best_cheaper", max(col("size")).over(wCheaper))
          .withColumn("best_same", max(col("size")).over(wSamePrice))
          .where(col("best_cheaper").isNull ||
            col("size") > col("best_cheaper"))
          .where(col("size") === col("best_same"))
          .select(col("brand"), col("partkey"), col("price_cents"),
            col("size"))
      })
  )
}
