package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.TextOps.{h32, h32Sql}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation surface (SURVEY.md §2.4): hash aggregates with map-side
  * partials (Spark's HashAggregateExec does partial+final automatically),
  * distinct aggregates, rollup/cube/grouping sets, approx sketches.
  * All money sums run in DECIMAL(18,2) for exact cross-engine parity,
  * emitted as DOUBLE.
  */
object AggregateQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** Per-(rf, cents) histogram with EXACT cumulative counts `cum` and
    * group totals `n` — the shared rank frame of q_agg_winsorize and
    * q_agg_decile_bounds. The cumsum is computed scale-safely in two
    * phases (the q_pack_sequences trick): `rf` has only a handful of
    * distinct values, so a Window.partitionBy(rf).orderBy(cents) would
    * sort the whole corpus-sized histogram on as many tasks as there
    * are groups (measured 2.7 s at sf0.1, 3 tasks doing everything).
    * Instead: shard = cents DIV 65536 is MONOTONE in cents, so the
    * within-shard cumsum (parallel: one window partition per
    * (rf, shard)) plus an exclusive running offset over the per-shard
    * totals (rows = value-range/65536 — tiny, broadcast back) compose
    * into the exact global rank. Measured cost of the extra offset
    * branch at sf0.1 (same-JVM, same-order bench): decile bounds
    * 4.1 → 4.7 s, winsorize unchanged — ~10% locally for a window
    * whose parallelism now scales with the value range instead of
    * being capped at the group count. */
  private def histogramRanks(c: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wLoc = Window.partitionBy(col("rf"), col("shard")).orderBy(col("cents"))
    val h = c.groupBy(col("rf"), col("cents")).agg(count(lit(1)).as("cnt"))
      .withColumn("shard", expr("cents DIV 65536"))
    val local = h.withColumn("lcum", sum(col("cnt")).over(wLoc))
    val wSh = Window.partitionBy(col("rf")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col("rf"))
    // per-shard totals straight from the SOURCE at (group, shard)
    // grain: the partial aggregate collapses map-side to
    // |groups × shards| rows, so this branch's shuffle is a few
    // hundred rows however big the corpus. The round-12 shape
    // re-aggregated the (group, value) histogram here instead, and
    // exchange reuse does NOT dedupe the two branches in practice
    // (measured: two full source scans AND two full histogram
    // shuffles at sf0.1) — deriving the offsets at shard grain keeps
    // the second scan (pruned, cheap) but deletes the duplicated
    // full-histogram exchange without caching anything
    val offs = c.withColumn("shard", expr("cents DIV 65536"))
      .groupBy(col("rf"), col("shard")).agg(count(lit(1)).as("tot"))
      .withColumn("off", coalesce(sum(col("tot")).over(wSh), lit(0L)))
      .withColumn("n", sum(col("tot")).over(wAll))
      .select(col("rf"), col("shard"), col("off"), col("n"))
    local.join(broadcast(offs), Seq("rf", "shard"))
      .select(col("rf"), col("cents"),
        (col("lcum") + col("off")).as("cum"), col("n"))
  }

  val defs: Seq[QueryDef] = Seq(
    // TPC-H Q1-shaped pricing summary: the canonical partial+final hash
    // agg. Money math runs in integer cents — floor(x*100 + 0.5) gives
    // integral doubles, whose sums are exact and order-independent
    // (< 2^53), so results are bit-identical across engines AND the agg
    // stays on the fast codegen'd double path (measured 4x faster than
    // decimal sums at sf0.1; the decimal-path parity is still exercised
    // by q_agg_rollup/q_agg_cube below).
    QueryDef("q1_agg_pricing", Some(
      """SELECT l_returnflag AS rf, l_linestatus AS ls,
        |  sum(floor(l_quantity*100 + 0.5))/100.0 AS sum_qty,
        |  sum(floor(l_extendedprice*100 + 0.5))/100.0 AS sum_base,
        |  sum(floor(l_extendedprice*100 + 0.5) * floor((1-l_discount)*100 + 0.5))/10000.0 AS sum_disc,
        |  sum(floor(l_quantity*100 + 0.5))/100.0/count(*) AS avg_qty,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin),
      headline = true)(
      (s, d) => {
        def cents(c: org.apache.spark.sql.Column) = floor(c * 100 + 0.5)
        Tables(s, d, "lineitem")
          .where(col("l_shipdate") <= to_timestamp(lit("2000-12-01 00:00:00")))
          .groupBy(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
          .agg(
            (sum(cents(col("l_quantity"))) / 100.0).as("sum_qty"),
            (sum(cents(col("l_extendedprice"))) / 100.0).as("sum_base"),
            (sum(cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount"))) / 10000.0)
              .as("sum_disc"),
            (sum(cents(col("l_quantity"))) / 100.0 / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("n"))
      }),

    // Distinct aggregates (expand + two-phase agg in Spark).
    QueryDef("q_agg_distinct", Some(
      """SELECT o_orderstatus AS status,
        |  count(DISTINCT o_custkey) AS n_cust,
        |  count(DISTINCT o_orderpriority) AS n_prio,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin))(
      (s, d) =>
        Tables(s, d, "orders")
          .groupBy(col("o_orderstatus").as("status"))
          .agg(
            countDistinct(col("o_custkey")).as("n_cust"),
            countDistinct(col("o_orderpriority")).as("n_prio"),
            count(lit(1)).as("n"))),

    // Min/max/count per group (exact doubles, no arithmetic).
    QueryDef("q_agg_minmax", Some(
      """SELECT c_mktsegment AS segment, min(c_acctbal) AS min_bal,
        |  max(c_acctbal) AS max_bal, count(*) AS n
        |FROM customer GROUP BY c_mktsegment""".stripMargin))(
      (s, d) =>
        Tables(s, d, "customer")
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(min(col("c_acctbal")).as("min_bal"),
            max(col("c_acctbal")).as("max_bal"),
            count(lit(1)).as("n"))),

    // ROLLUP: hierarchical subtotals (NULL marks rolled-up levels in both).
    // ---- boolean aggregates: bool_and / bool_or / count_if — the
    // ANSI EVERY/ANY surface, identical text in both dialects (both
    // engines ship all three under these names). The predicates mix a
    // group-invariant check (prices positive everywhere) with
    // group-varying ones, so both TRUE and FALSE appear in each
    // column. ----
    QueryDef("q_agg_bool", Some(
      """SELECT o_orderstatus AS status,
        |  bool_and(o_totalprice > 0) AS all_positive,
        |  bool_and(o_totalprice > 100000) AS all_large,
        |  bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
        |  CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin))(
      (s, d) =>
        Tables(s, d, "orders")
          .groupBy(col("o_orderstatus").as("status"))
          .agg(expr("bool_and(o_totalprice > 0) AS all_positive"),
            expr("bool_and(o_totalprice > 100000) AS all_large"),
            expr("bool_or(o_orderpriority = '1-URGENT') AS any_urgent"),
            expr("CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big"),
            count(lit(1)).as("n"))),

    // ---- two-sided 10% trimmed mean: EXCLUDE the bottom and top
    // decile rows and average the rest — the outlier-robust mean that
    // complements q_agg_winsorize (which CLIPS the tails instead of
    // dropping them). Trim boundaries are exact integer ranks
    // (n div 10 off each side) over a per-group row_number with a
    // unique tie-break, so both engines drop the same rows; the mean
    // is an exact cents sum DIV count plus one double division.
    // Scale: one group-partitioned window pass + one aggregate — at a
    // group too large for a window sort, swap the rank for the
    // sharded-cumsum rank (the weighted-median machinery). ----
    QueryDef("q_agg_trimmed_mean", Some(
      """WITH r AS (
        |  SELECT l_returnflag AS rf,
        |    CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY floor(l_extendedprice*100 + 0.5),
        |               l_orderkey, l_linenumber) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT rf, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(cents) // count(*) AS BIGINT) AS trimmed_mean_cents,
        |  CAST(sum(cents) AS DOUBLE) / count(*) / 100.0 AS trimmed_mean
        |FROM r
        |WHERE rn > n // 10 AND rn <= n - n // 10
        |GROUP BY rf""".stripMargin))(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("rf"))
          .orderBy(col("sortc").asc, col("l_orderkey").asc,
            col("l_linenumber").asc)
        val wN = Window.partitionBy(col("rf"))
        Tables(s, d, "lineitem")
          .select(col("l_returnflag").as("rf"),
            floor(col("l_extendedprice") * 100 + 0.5).as("sortc"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("bigint")
              .as("cents"),
            col("l_orderkey"), col("l_linenumber"))
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wN))
          .where(col("rn") > expr("n div 10") &&
            col("rn") <= col("n") - expr("n div 10"))
          .groupBy(col("rf"))
          .agg(count(lit(1)).cast("bigint").as("n_kept"),
            sum(col("cents")).cast("bigint").as("sum_cents"),
            expr("CAST(sum(cents) DIV count(1) AS BIGINT)")
              .as("trimmed_mean_cents"),
            (sum(col("cents")).cast("double") / count(lit(1)) / 100.0)
              .as("trimmed_mean"))
      }),

    // ---- hierarchical share-of-parent: each nation's share of its
    // region and each region's share of the corpus, in one report —
    // the ratio-to-parent reporting shape rollup alone can't express
    // (rollup gives the LEVELS; the shares need child and parent on
    // the same row). Two-level aggregate + broadcast join-back of the
    // region and grand totals; shares are exact integer millionths
    // ((child · 1e6) DIV parent — counts are non-negative, so DuckDB's
    // floor `//` and Spark's truncating DIV agree) with NO double
    // ratios, so the row is bit-stable. Scale: one hash agg over the
    // fact, then dimension-sized frames only. ----
    QueryDef("q_agg_share_of_parent", Some(
      """WITH cn AS (
        |  SELECT n.n_regionkey AS rkey, n.n_name AS nation,
        |    count(*) AS n_cust
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1, 2),
        |cr AS (SELECT rkey, CAST(sum(n_cust) AS BIGINT) AS r_cust
        |       FROM cn GROUP BY rkey),
        |t AS (SELECT CAST(sum(n_cust) AS BIGINT) AS t_cust FROM cn)
        |SELECT r.r_name AS region, cn.nation,
        |  CAST(cn.n_cust AS BIGINT) AS n_cust, cr.r_cust,
        |  CAST((cn.n_cust * 1000000) // cr.r_cust AS BIGINT)
        |    AS share_region_e6,
        |  CAST((cr.r_cust * 1000000) // t.t_cust AS BIGINT)
        |    AS region_share_e6
        |FROM cn JOIN cr ON cn.rkey = cr.rkey
        |JOIN region r ON r.r_regionkey = cn.rkey CROSS JOIN t""".stripMargin))(
      (s, d) => {
        val cn = Tables(s, d, "customer")
          .join(broadcast(Tables(s, d, "nation")),
            expr("c_nationkey = n_nationkey"))
          .groupBy(col("n_regionkey").as("rkey"), col("n_name").as("nation"))
          .agg(count(lit(1)).as("n_cust"))
        val cr = cn.groupBy(col("rkey").as("crkey"))
          .agg(sum(col("n_cust")).cast("bigint").as("r_cust"))
        val t = cn.agg(sum(col("n_cust")).cast("bigint").as("t_cust"))
        cn.join(broadcast(cr), col("rkey") === col("crkey"))
          .join(broadcast(Tables(s, d, "region")),
            expr("r_regionkey = rkey"))
          .crossJoin(broadcast(t))
          .select(col("r_name").as("region"), col("nation"),
            col("n_cust").cast("bigint").as("n_cust"), col("r_cust"),
            expr("CAST((n_cust * 1000000) DIV r_cust AS BIGINT)")
              .as("share_region_e6"),
            expr("CAST((r_cust * 1000000) DIV t_cust AS BIGINT)")
              .as("region_share_e6"))
      }),

    QueryDef("q_agg_rollup", Some(
      """SELECT o_orderstatus AS status, o_orderpriority AS priority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin))(
      (s, d) =>
        Tables(s, d, "orders")
          .rollup(col("o_orderstatus").as("status"), col("o_orderpriority").as("priority"))
          .agg(sum(dec(col("o_totalprice"))).cast("double").as("total"),
            count(lit(1)).as("n"))),

    // CUBE: all grouping combinations.
    QueryDef("q_agg_cube", Some(
      """SELECT l_returnflag AS rf, l_linestatus AS ls,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin))(
      (s, d) =>
        Tables(s, d, "lineitem")
          .cube(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
          .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            count(lit(1)).as("n"))),

    // GROUPING SETS with grouping() disambiguation (SQL-expressed; the
    // fixture views are registered per call).
    QueryDef("q_agg_grouping_sets", Some(
      """SELECT o_orderstatus AS status, o_orderpriority AS priority,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
        |  count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin))(
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql(
          """SELECT o_orderstatus AS status, o_orderpriority AS priority,
            |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
            |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
            |  count(*) AS n
            |FROM orders
            |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
      }),

    // HAVING-style post-aggregation filter.
    QueryDef("q_agg_having", Some(
      """SELECT o_custkey AS custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 3""".stripMargin))(
      (s, d) =>
        Tables(s, d, "orders")
          .groupBy(col("o_custkey").as("custkey"))
          .agg(count(lit(1)).as("n_orders"),
            sum(dec(col("o_totalprice"))).cast("double").as("spend"))
          .where(col("n_orders") >= 3)),

    // PIVOT: status columns per priority (explicit value list keeps the
    // output schema static — required for a deterministic oracle, and
    // the scale-safe form: pivot without values collects the distinct
    // set to the driver first). Empty cells coalesce to 0 on both sides.
    QueryDef("q_agg_pivot", Some(
      """SELECT o_orderpriority AS priority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F'
        |       THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS spend_f
        |FROM orders GROUP BY o_orderpriority""".stripMargin))(
      (s, d) => {
        val p = Tables(s, d, "orders")
          .groupBy(col("o_orderpriority").as("priority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).as("spend"))
        p.select(col("priority"),
          coalesce(col("F_n"), lit(0L)).as("n_f"),
          coalesce(col("O_n"), lit(0L)).as("n_o"),
          coalesce(col("P_n"), lit(0L)).as("n_p"),
          coalesce(col("F_spend"), lit(0).cast("decimal(18,2)"))
            .cast("double").as("spend_f"))
      }),

    // Exact interpolated percentiles: Spark percentile() and DuckDB
    // quantile_cont use the same linear-interpolation definition over
    // the sorted multiset — identical doubles on 2-decimal data.
    // Emitted as scalar columns (the driver compare can't sort rows
    // containing array cells).
    QueryDef("q_agg_percentile", Some(
      """SELECT c_mktsegment AS segment,
        |  quantile_cont(c_acctbal, 0.25) AS bal_p25,
        |  quantile_cont(c_acctbal, 0.5) AS bal_p50,
        |  quantile_cont(c_acctbal, 0.9) AS bal_p90,
        |  count(*) AS n
        |FROM customer GROUP BY c_mktsegment""".stripMargin))(
      (s, d) =>
        Tables(s, d, "customer")
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(
            expr("percentile(c_acctbal, 0.25D)").as("bal_p25"),
            expr("percentile(c_acctbal, 0.5D)").as("bal_p50"),
            expr("percentile(c_acctbal, 0.9D)").as("bal_p90"),
            count(lit(1)).as("n"))),

    // Approximate distinct (HLL++) — the 100TB-scale alternative to
    // exact countDistinct. The sketch VALUE is engine-specific and
    // can't be oracled, but the sketch CONTRACT can: emit the exact
    // count plus a boolean `abs(approx-exact)/exact <= 0.05`. The
    // oracle computes its own exact count and asserts the same boolean
    // as a constant TRUE — if Spark's estimate ever drifts past the
    // tolerance, within_tol flips false and the gate hash-mismatches.
    QueryDef("q_agg_approx_distinct", Some(
      """SELECT l_returnflag AS rf, count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS within_tol
        |FROM lineitem GROUP BY l_returnflag""".stripMargin))(
      (s, d) =>
        Tables(s, d, "lineitem")
          .groupBy(col("l_returnflag").as("rf"))
          .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
            countDistinct(col("l_partkey")).as("exact_parts"))
          .select(col("rf"), col("exact_parts"),
            (abs(col("approx_parts") - col("exact_parts")).cast("double") /
              col("exact_parts") <= 0.05).as("within_tol"))),

    // ---- statistical mode per group, explicit tie-break (count desc,
    // value asc) — built-in mode() tie-breaking is engine-defined, so
    // both sides compute the count+rank formulation verbatim. One
    // two-key shuffle + a groups-sized window: scales. ----
    QueryDef("q_agg_mode", Some(
      """SELECT rf, qty AS mode_qty, n FROM (
        |  SELECT l_returnflag AS rf, l_quantity AS qty, count(*) AS n,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY count(*) DESC, l_quantity) AS rn
        |  FROM lineitem GROUP BY l_returnflag, l_quantity)
        |WHERE rn = 1""".stripMargin))(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("rf")).orderBy(col("n").desc, col("qty").asc)
        Tables(s, d, "lineitem")
          .groupBy(col("l_returnflag").as("rf"), col("l_quantity").as("qty"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("rf"), col("qty").as("mode_qty"), col("n"))
      }),

    // ---- UNPIVOT/melt (inverse of pivot): wide per-line measures →
    // long (metric, val) rows via Spark's native unpivot operator (a
    // single Expand node — one pass, no join/union re-scan). The
    // oracle spells the same reshape as a UNION ALL, the
    // engine-portable formulation. ----
    QueryDef("q_agg_unpivot", Some(
      """SELECT l_orderkey, l_linenumber, metric, val FROM (
        |  SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
        |    CAST(l_quantity AS DOUBLE) AS val FROM lineitem WHERE l_orderkey < 100
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'extendedprice',
        |    CAST(l_extendedprice AS DOUBLE) FROM lineitem WHERE l_orderkey < 100
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'discount',
        |    CAST(l_discount AS DOUBLE) FROM lineitem WHERE l_orderkey < 100)""".stripMargin))(
      (s, d) =>
        Tables(s, d, "lineitem")
          .where(col("l_orderkey") < 100)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("double").as("quantity"),
            col("l_extendedprice").cast("double").as("extendedprice"),
            col("l_discount").cast("double").as("discount"))
          .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("quantity"), col("extendedprice"), col("discount")),
            "metric", "val")),

    // ---- EXACT covariance/correlation: built-in covar/corr stream
    // double moments whose value depends on partial-agg order (not
    // cross-engine reproducible). Here the 2-decimal columns go
    // through DECIMAL → scaled BIGINT moments (Sx, Sy, Sxy, Sxx, Syy —
    // exact, order-independent integer sums), and covar/corr come out
    // as a fixed chain of double ops over those exact integers —
    // bit-identical in both engines. Moments accumulate in wide exact
    // integers (Spark DECIMAL(38,0), DuckDB HUGEINT) so even 1e11-row
    // groups at the 100 TB design point stay exact — int64 would wrap
    // silently in Spark (non-ANSI) near n*sxx ~ 1e19. ----
    QueryDef("q_agg_covar_exact", Some(
      """WITH s AS (
        |  SELECT l_returnflag AS rf,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qx,
        |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS dy
        |  FROM lineitem),
        |m AS (
        |  SELECT rf, count(*) AS n,
        |    sum(qx) AS sx, sum(dy) AS sy,
        |    sum(qx * dy) AS sxy,
        |    sum(qx * qx) AS sxx,
        |    sum(dy * dy) AS syy
        |  FROM s GROUP BY rf)
        |SELECT rf, n,
        |  CAST(n * sxy - sx * sy AS DOUBLE) / n / n / 10000.0 AS covar_pop,
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |    / sqrt(CAST(n * syy - sy * sy AS DOUBLE)) AS corr
        |FROM m""".stripMargin))(
      (s, d) => {
        val scaled = Tables(s, d, "lineitem").select(
          col("l_returnflag").as("rf"),
          (col("l_quantity").cast("decimal(18,2)") * 100).cast("bigint").as("qx"),
          (col("l_discount").cast("decimal(18,2)") * 100).cast("bigint").as("dy"))
        // Per-row products fit int64 comfortably (|qx*qx| <= 2.5e7);
        // the SUMS are the overflow risk, so they accumulate in
        // DECIMAL(38,0) (sum over decimal(28,0) widens to 38,0 —
        // exact). DuckDB's sum(BIGINT) is HUGEINT (int128): both
        // engines carry exact integers to ~1e38, then one final
        // cast-to-double rounds identically.
        scaled.groupBy(col("rf"))
          .agg(count(lit(1)).as("n"),
            sum(col("qx").cast("decimal(28,0)")).as("sx"),
            sum(col("dy").cast("decimal(28,0)")).as("sy"),
            sum((col("qx") * col("dy")).cast("decimal(28,0)")).as("sxy"),
            sum((col("qx") * col("qx")).cast("decimal(28,0)")).as("sxx"),
            sum((col("dy") * col("dy")).cast("decimal(28,0)")).as("syy"))
          .select(col("rf"), col("n"),
            ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / col("n") / col("n") / lit(10000.0)).as("covar_pop"),
            ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
              / sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
              .as("corr"))
      }),

    // ANSI FILTER clause: per-group conditional aggregates in ONE pass
    // (one shuffle, partial+final) instead of self-joining filtered
    // subqueries. Money sums through DECIMAL(18,2) per the parity
    // rules.
    QueryDef("q_agg_filter_clause", Some(
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE o_orderstatus = 'F'), 0) AS DOUBLE) AS finished_value
        |FROM orders GROUP BY o_orderpriority""".stripMargin))(
      (s, d) =>
        Tables(s, d, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
            coalesce(
              sum(when(col("o_orderstatus") === "F",
                col("o_totalprice").cast("decimal(18,2)"))),
              lit(0).cast("decimal(18,2)"))
              .cast("double").as("finished_value"))),

    // ---- column profiler (data-quality sweep before training runs):
    // per-column row/null/exact-distinct counts and stringified
    // min/max. Shape: one SINGLE-COLUMN scan per profiled column,
    // unioned — measured 4-5× faster than the tempting one-scan
    // stack() formulation, because k exact distincts in one agg cost
    // an Expand (scan rows × k, every row carrying ALL profiled
    // columns through the shuffle) while per-column scans are pruned
    // to one column each by the parquet reader and each plans the
    // efficient single-distinct two-phase aggregate. The same
    // argument holds at 100 TB for columnar storage; the approx
    // variant (q_agg_approx_distinct's accuracy contract) drops the
    // distinct shuffles entirely. Parity: min/max stringify through
    // engine-stable types only (BIGINT verbatim, money through
    // DECIMAL(18,2), timestamps through epoch micros). ----
    QueryDef("q_profile_columns", Some {
      def one(name: String, nulls: String, nd: String, mn: String, mx: String) =
        s"""SELECT '$name' AS col_name, count(*) AS n_rows,
           |  count(*) - count($nulls) AS n_nulls,
           |  count(DISTINCT $nd) AS n_distinct,
           |  CAST($mn AS VARCHAR) AS min_str, CAST($mx AS VARCHAR) AS max_str
           |FROM lineitem""".stripMargin
      Seq(
        one("l_orderkey", "l_orderkey", "l_orderkey",
          "min(l_orderkey)", "max(l_orderkey)"),
        one("l_linenumber", "l_linenumber", "l_linenumber",
          "min(l_linenumber)", "max(l_linenumber)"),
        one("l_quantity", "l_quantity", "l_quantity",
          "CAST(min(l_quantity) AS DECIMAL(18,2))",
          "CAST(max(l_quantity) AS DECIMAL(18,2))"),
        one("l_returnflag", "l_returnflag", "l_returnflag",
          "min(l_returnflag)", "max(l_returnflag)"),
        one("l_shipdate", "l_shipdate", "l_shipdate",
          "epoch_us(min(l_shipdate))", "epoch_us(max(l_shipdate))")
      ).mkString("\nUNION ALL\n")
    })(
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        def prof(name: String, minS: Column, maxS: Column) =
          li.agg(count(lit(1)).as("n_rows"),
            (count(lit(1)) - count(col(name))).as("n_nulls"),
            countDistinct(col(name)).as("n_distinct"),
            minS.as("min_str"), maxS.as("max_str"))
            .select(lit(name).as("col_name"), col("n_rows"),
              col("n_nulls"), col("n_distinct"),
              col("min_str"), col("max_str"))
        prof("l_orderkey",
            min(col("l_orderkey")).cast("string"),
            max(col("l_orderkey")).cast("string"))
          .unionAll(prof("l_linenumber",
            min(col("l_linenumber")).cast("string"),
            max(col("l_linenumber")).cast("string")))
          .unionAll(prof("l_quantity",
            min(col("l_quantity")).cast("decimal(18,2)").cast("string"),
            max(col("l_quantity")).cast("decimal(18,2)").cast("string")))
          .unionAll(prof("l_returnflag",
            min(col("l_returnflag")), max(col("l_returnflag"))))
          .unionAll(prof("l_shipdate",
            unix_micros(min(col("l_shipdate")).cast("timestamp")).cast("string"),
            unix_micros(max(col("l_shipdate")).cast("timestamp")).cast("string")))
      }),

    // ---- key-skew report: the profiling pass run BEFORE sizing a
    // join/agg on a key — per-key counts reduced to the distribution
    // stats that drive the salting decision (max/avg fan-out, p99,
    // and the integer salt factor the measured-fanout salted join in
    // Relational.scala would apply). Two shuffles total: per-key
    // count (partial+final), then a single-row global reduce — the
    // report costs one pass regardless of table size. The salt
    // recommendation is exact integer arithmetic (ceil via
    // (max·keys + rows − 1) div rows), no FP boundary. ----
    QueryDef("q_profile_key_skew", Some(
      """WITH k AS (
        |  SELECT l_partkey AS key, count(*) AS c FROM lineitem GROUP BY 1)
        |SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
        |  min(c) AS min_c, max(c) AS max_c,
        |  quantile_cont(c, 0.99) AS p99_c,
        |  max(c) * count(*) / CAST(sum(c) AS DOUBLE) AS skew_ratio,
        |  CAST((max(c) * count(*) + sum(c) - 1) // sum(c) AS BIGINT)
        |    AS salt_factor
        |FROM k""".stripMargin))(
      (s, d) =>
        Tables(s, d, "lineitem")
          .groupBy(col("l_partkey").as("key"))
          .agg(count(lit(1)).as("c"))
          .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
            min(col("c")).as("min_c"), max(col("c")).as("max_c"),
            expr("percentile(c, 0.99D)").as("p99_c"))
          .select(col("n_keys"), col("n_rows"), col("min_c"), col("max_c"),
            col("p99_c"),
            (col("max_c") * col("n_keys") / col("n_rows").cast("double"))
              .as("skew_ratio"),
            expr("CAST((max_c * n_keys + n_rows - 1) div n_rows AS BIGINT)")
              .as("salt_factor"))),

    // ---- join-cardinality forecast from key histograms: the
    // pre-flight a planner (or a dedup pipeline) runs BEFORE paying
    // for an N:M join — |A ⋈_k A| = Σ c(k)², computed from the
    // per-key histogram at the cost of one count(*) aggregate
    // instead of the join itself. Forecasting the self-join on
    // l_partkey is exactly the candidate-pair explosion check for a
    // similarity self-join keyed on partkey. Exact BIGINT arithmetic
    // end-to-end; the hottest key is reported with a deterministic
    // min-key tiebreak. ----
    QueryDef("q_profile_join_fanout", Some(
      """WITH c AS (
        |  SELECT l_partkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
        |m AS (SELECT max(c) AS cmax FROM c),
        |t AS (SELECT min(k) AS top_key, min(cmax) AS cmax
        |      FROM c, m WHERE c.c = m.cmax)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(c) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(c AS HUGEINT)*c) AS BIGINT) AS pairs_forecast,
        |  CAST(min(t.top_key) AS BIGINT) AS top_key,
        |  CAST(min(t.cmax) * min(t.cmax) AS BIGINT) AS max_key_pairs
        |FROM c, t""".stripMargin))(
      (s, d) => {
        val c = Tables(s, d, "lineitem")
          .groupBy(col("l_partkey").as("k"))
          .agg(count(lit(1)).as("c"))
        val m = c.agg(max(col("c")).as("cmax"))
        val t = c.crossJoin(broadcast(m)).where(col("c") === col("cmax"))
          .agg(min(col("k")).as("top_key"), min(col("cmax")).as("cmax"))
        c.agg(count(lit(1)).as("n_keys"),
            sum(col("c")).cast("bigint").as("n_rows"),
            sum(col("c").cast("decimal(38,0)") * col("c")).cast("bigint")
              .as("pairs_forecast"))
          .crossJoin(broadcast(t))
          .select(col("n_keys"), col("n_rows"), col("pairs_forecast"),
            col("top_key").cast("bigint").as("top_key"),
            (col("cmax") * col("cmax")).cast("bigint").as("max_key_pairs"))
      }),

    // ---- declarative data-quality constraint suite (the Deequ
    // shape): uniqueness, referential integrity, null-completeness,
    // value-range and domain checks evaluated in one report — the
    // gate a migration pipeline runs before switching reads to the
    // new store (the reference validates only row counts,
    // py:124/148; this is the stronger contract). Each constraint
    // reduces to an exact BIGINT violation count + a PASS flag, so
    // the whole report is oracled. Scale: one aggregate per table
    // plus one anti-join — no constraint costs more than a scan. ----
    QueryDef("q_profile_constraints", Some(constraintsSql))(
      (s, d) => constraintsReport(s, d)),

    // ---- most-common-values profile (optimizer MCV statistics): the
    // top-5 values per profiled column with counts, fractions, and
    // the column's distinct count — the companion to
    // q_agg_decile_bounds for categorical/discrete columns, and what
    // a cost model consults before picking join sides. One pruned
    // single-column scan per column (the q_profile_columns lesson:
    // faster than a stack()/Expand over the whole row), histograms
    // unioned, and the rank window runs over the per-column HISTOGRAM
    // (|distinct values| rows), never over the table. The
    // (cnt DESC, val ASC) order is total, so the top-5 cut is
    // deterministic in both engines. ----
    QueryDef("q_profile_mfv", Some(
      """WITH vals AS (
        |  SELECT 'o_orderstatus' AS col_name, o_orderstatus AS val FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', o_orderpriority FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders),
        |h AS (SELECT col_name, val, count(*) AS cnt FROM vals GROUP BY 1, 2),
        |tot AS (SELECT col_name, CAST(sum(cnt) AS BIGINT) AS n,
        |          count(*) AS n_distinct
        |        FROM h GROUP BY col_name),
        |r AS (SELECT h.*, row_number() OVER (PARTITION BY col_name
        |        ORDER BY cnt DESC, val) AS rk FROM h)
        |SELECT r.col_name, CAST(r.rk AS BIGINT) AS rank, r.val, r.cnt,
        |  CAST(r.cnt AS DOUBLE) / t.n AS frac, t.n_distinct
        |FROM r JOIN tot t ON t.col_name = r.col_name
        |WHERE r.rk <= 5""".stripMargin))(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def colVals(name: String, c: Column) =
          Tables(s, d, "orders").select(lit(name).as("col_name"),
            c.cast("string").as("val"))
        val h = colVals("o_orderstatus", col("o_orderstatus"))
          .unionAll(colVals("o_orderpriority", col("o_orderpriority")))
          .unionAll(colVals("o_custkey", col("o_custkey")))
          .groupBy(col("col_name"), col("val"))
          .agg(count(lit(1)).as("cnt"))
        val tot = h.groupBy(col("col_name"))
          .agg(sum(col("cnt")).cast("bigint").as("n"),
            count(lit(1)).as("n_distinct"))
        h.withColumn("rk", row_number().over(
            Window.partitionBy(col("col_name"))
              .orderBy(col("cnt").desc, col("val").asc)))
          .where(col("rk") <= 5)
          .join(broadcast(tot), "col_name")
          .select(col("col_name"), col("rk").cast("bigint").as("rank"),
            col("val"), col("cnt"),
            (col("cnt").cast("double") / col("n")).as("frac"),
            col("n_distinct"))
      }),

    // ---- salted exact distinct for HOT group keys: l_returnflag has
    // ---- salted exact distinct for HOT group keys: l_returnflag has
    // 3 values over the whole fact table, so a naive per-group
    // distinct funnels each key's entire value set through one
    // reducer. Sharding by a hash of the VALUE (not a random salt)
    // splits each group's distinct state into 16 disjoint shards —
    // every distinct value lands in exactly one shard, so the shard
    // counts SUM to the exact answer — and the heavy shuffle spreads
    // over (key, shard). The plain-distinct oracle pins exactness.
    // (For algebraic aggs Spark's map-side partials already handle
    // hot keys; value-sharding is the pattern for the non-algebraic
    // distinct state.) ----
    QueryDef("q_agg_distinct_salted", Some(
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_parts,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin))(
      (s, d) =>
        Tables(s, d, "lineitem")
          .groupBy(col("l_returnflag"),
            pmod(col("l_partkey"), lit(16L)).as("shard"))
          .agg(countDistinct(col("l_partkey")).as("nd_shard"),
            count(lit(1)).as("n_shard"))
          .groupBy(col("l_returnflag"))
          .agg(sum(col("nd_shard")).as("nd_parts"),
            sum(col("n_shard")).as("n"))),

    // ---- incremental aggregate refresh (materialized-view
    // maintenance): a stored BASE aggregate absorbs a DELTA batch by
    // merging algebraic partial states — (count, sum, min, max) are
    // all mergeable, so the refresh costs one aggregation of the
    // delta plus a key-wise combine with the base (size = |groups|,
    // not |data|). The full-recompute oracle pins that merge ==
    // recompute, the contract every incremental pipeline rests on.
    // The delta here is a deterministic slice of the fixture
    // (o_orderkey % 10 = 0); at 100 TB the base state would persist
    // between runs and only the combine re-executes. ----
    QueryDef("q_agg_incremental_refresh", Some(
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  min(o_totalprice) AS mn, max(o_totalprice) AS mx
        |FROM orders GROUP BY o_orderpriority""".stripMargin))(
      (s, d) => {
        val o = Tables(s, d, "orders")
        def state(df: org.apache.spark.sql.DataFrame) =
          df.groupBy(col("o_orderpriority"))
            .agg(count(lit(1)).as("n"),
              sum(col("o_totalprice").cast("decimal(18,2)")).as("total_dec"),
              min(col("o_totalprice")).as("mn"),
              max(col("o_totalprice")).as("mx"))
        val base = state(o.where(pmod(col("o_orderkey"), lit(10L)) =!= 0))
        val delta = state(o.where(pmod(col("o_orderkey"), lit(10L)) === 0))
        base.unionAll(delta)
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("n")).as("n"),
            sum(col("total_dec")).cast("double").as("total"),
            min(col("mn")).as("mn"), max(col("mx")).as("mx"))
      }),

    // ---- per-group winsorization at an EXACT p95 (feature-clipping
    // for training pipelines / robust revenue rollups). The cutoff is
    // the smallest value v with #(rows ≤ v) ≥ 95% of the group —
    // integer rank arithmetic (20·cum ≥ 19·n), no FP percentile, so
    // both engines agree bit-for-bit. Scale: the rank window runs
    // over the per-(group, value) HISTOGRAM — cardinality = distinct
    // prices per flag, not rows — so the only full-data shuffles are
    // the histogram groupBy and the final aggregate; the tiny cutoff
    // table broadcasts back. (For truly unbounded value domains route
    // to q_sketch_quantile_sample and accept approximation.) Money is
    // integer cents throughout; sums are integral and exact. ----
    QueryDef("q_agg_winsorize", Some(
      """WITH c AS (
        |  SELECT l_returnflag AS rf,
        |    CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem),
        |h AS (SELECT rf, cents, count(*) AS cnt FROM c GROUP BY 1, 2),
        |r AS (
        |  SELECT rf, cents,
        |    sum(cnt) OVER (PARTITION BY rf ORDER BY cents) AS cum,
        |    sum(cnt) OVER (PARTITION BY rf) AS n
        |  FROM h),
        |cut AS (
        |  SELECT rf, min(cents) AS cutoff FROM r
        |  WHERE 20 * cum >= 19 * n GROUP BY rf)
        |SELECT c.rf, count(*) AS n,
        |  cut.cutoff / 100.0 AS p95_value,
        |  sum(c.cents) / 100.0 AS sum_raw,
        |  sum(least(c.cents, cut.cutoff)) / 100.0 AS sum_winsorized,
        |  count(CASE WHEN c.cents > cut.cutoff THEN 1 END) AS n_capped
        |FROM c JOIN cut ON c.rf = cut.rf
        |GROUP BY c.rf, cut.cutoff""".stripMargin))(
      (s, d) => {
        val c = Tables(s, d, "lineitem")
          .select(col("l_returnflag").as("rf"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("bigint").as("cents"))
        val cut = histogramRanks(c)
          .where(lit(20) * col("cum") >= lit(19) * col("n"))
          .groupBy(col("rf")).agg(min(col("cents")).as("cutoff"))
        c.join(broadcast(cut), "rf")
          .groupBy(col("rf"), col("cutoff"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).as("sum_cents"),
            sum(least(col("cents"), col("cutoff"))).as("sum_win_cents"),
            count(when(col("cents") > col("cutoff"), 1)).as("n_capped"))
          .select(col("rf"), col("n"),
            (col("cutoff") / 100.0).as("p95_value"),
            (col("sum_cents") / 100.0).as("sum_raw"),
            (col("sum_win_cents") / 100.0).as("sum_winsorized"),
            col("n_capped"))
      }),

    // ---- equi-depth DECILE boundaries per group — the statistics-
    // collection primitive behind optimizer histograms and drift
    // monitoring. Boundary k is the smallest value with
    // #(rows ≤ v) ≥ k/10 of the group: same histogram-rank arithmetic
    // as q_agg_winsorize (10·cum ≥ k·n, pure integers) with the nine
    // k's exploded AGAINST THE HISTOGRAM (distinct values × 9, never
    // rows × 9), then a min per (group, k). One full-data shuffle
    // total (the histogram groupBy); everything after runs on the
    // distinct-value frame. ----
    QueryDef("q_agg_decile_bounds", Some(
      """WITH c AS (
        |  SELECT l_returnflag AS rf,
        |    CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem),
        |h AS (SELECT rf, cents, count(*) AS cnt FROM c GROUP BY 1, 2),
        |r AS (
        |  SELECT rf, cents,
        |    sum(cnt) OVER (PARTITION BY rf ORDER BY cents) AS cum,
        |    sum(cnt) OVER (PARTITION BY rf) AS n
        |  FROM h),
        |x AS (
        |  SELECT r.rf, r.cents, r.cum, r.n, k.k
        |  FROM r, unnest(range(1, 10)) AS k(k)
        |  WHERE 10 * r.cum >= k.k * r.n)
        |SELECT rf, CAST(k AS INT) AS decile,
        |  min(cents) / 100.0 AS boundary
        |FROM x GROUP BY rf, k""".stripMargin))(
      (s, d) => {
        val c = Tables(s, d, "lineitem")
          .select(col("l_returnflag").as("rf"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("bigint").as("cents"))
        histogramRanks(c)
          .select(col("rf"), col("cents"), col("cum"), col("n"),
            explode(sequence(lit(1L), lit(9L))).as("k"))
          .where(lit(10) * col("cum") >= col("k") * col("n"))
          .groupBy(col("rf"), col("k").cast("int").as("decile"))
          .agg((min(col("cents")) / 100.0).as("boundary"))
      }),

    // ---- POISSON bootstrap CI for the mean — THE distributed
    // bootstrap (resampling-with-replacement needs global row
    // indexing; Poisson weights need only the row itself): every
    // (row, replica) draws a weight from Poisson(1) via hash-inverse-
    // CDF against PRECOMPUTED integer thresholds, so the entire
    // resample — and therefore the CI — is deterministic and
    // bit-oracled. Replica means are one exact-integer division each;
    // the across-replica moments fold the B=16 ordered means
    // SEQUENTIALLY (sorted list + left fold in both engines), so even
    // that float sum has a pinned order. Scale: the explode is a
    // map-side 16× fanout into a partial+final aggregate with B
    // groups — no shuffle grows with B×rows. ----
    QueryDef("q_agg_bootstrap_ci", Some {
      // cumulative Poisson(1) thresholds on the h32 range [0, 2^32):
      // floor(2^32 * CDF(k)) for k = 0..3; weight 4 beyond (mass 4e-5)
      val e = math.exp(1.0)
      val cdf = Seq(1.0, 2.0, 2.5, 8.0 / 3.0).map(_ / e)
      val ts = cdf.map(c => math.floor(c * 4294967296.0).toLong)
      val wSql = s"""CASE WHEN u < ${ts(0)} THEN 0 WHEN u < ${ts(1)} THEN 1
                    |WHEN u < ${ts(2)} THEN 2 WHEN u < ${ts(3)} THEN 3
                    |ELSE 4 END""".stripMargin.replace("\n", " ")
      // ONE md5 per row, then a per-replica affine rehash over the
      // 32-bit ring (the minhash-family construction) — 16x cheaper
      // than hashing (row, replica) pairs, same determinism
      s"""WITH base AS (
         |  SELECT CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents,
         |    ${h32Sql("CAST(o_orderkey AS VARCHAR)")} AS h0
         |  FROM orders),
         |r AS (
         |  SELECT b.b AS b, cents,
         |    (${graft.ops.TextOps.minhashA.head} * b.b + 12345
         |      + h0 * (2 * b.b + 1)) % 4294967296 AS u
         |  FROM base, unnest(range(0, 16)) AS b(b)),
         |w AS (SELECT b, cents, $wSql AS w FROM r),
         |rep AS (
         |  SELECT b, CAST(sum(w * cents) AS DOUBLE) / CAST(sum(w) AS DOUBLE)
         |    AS mean_b
         |  FROM w WHERE w > 0 GROUP BY b),
         |folds AS (
         |  SELECT list(mean_b ORDER BY b) AS l FROM rep),
         |stats AS (
         |  SELECT
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), l),
         |      (x, y) -> x + y) AS s1,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(l, x -> x * x)), (x, y) -> x + y) AS s2
         |  FROM folds),
         |pt AS (
         |  SELECT CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
         |      AS DOUBLE) / count(*) AS point_mean
         |  FROM orders)
         |SELECT pt.point_mean / 100.0 AS point_mean,
         |  stats.s1 / 16.0 / 100.0 AS boot_mean,
         |  sqrt((stats.s2 - stats.s1 * stats.s1 / 16.0) / 15.0) / 100.0
         |    AS boot_se
         |FROM pt CROSS JOIN stats""".stripMargin
    })(
      (s, d) => {
        val e = math.exp(1.0)
        val cdf = Seq(1.0, 2.0, 2.5, 8.0 / 3.0).map(_ / e)
        val ts = cdf.map(c => math.floor(c * 4294967296.0).toLong)
        val o = Tables(s, d, "orders")
        // hash BEFORE the replica fanout: one md5 per order, not 16 —
        // a projection after the Generate would re-evaluate per
        // exploded row (measured 3x on this query)
        val base = o.select(
          floor(col("o_totalprice") * 100 + 0.5).cast("bigint").as("cents"),
          h32(col("o_orderkey").cast("string")).as("h0"))
        val r = base.select(col("cents"), col("h0"),
            explode(sequence(lit(0L), lit(15L))).as("b"))
          .withColumn("u",
            (lit(graft.ops.TextOps.minhashA.head) * col("b") + lit(12345L)
              + col("h0") * (lit(2L) * col("b") + lit(1L))) % lit(4294967296L))
        val w = when(col("u") < ts(0), 0).when(col("u") < ts(1), 1)
          .when(col("u") < ts(2), 2).when(col("u") < ts(3), 3).otherwise(4)
        val rep = r.withColumn("w", w).where(col("w") > 0)
          .groupBy(col("b"))
          .agg((sum(col("w") * col("cents")).cast("double")
            / sum(col("w")).cast("double")).as("mean_b"))
        val folds = rep
          .agg(array_sort(collect_list(struct(col("b"), col("mean_b")))).as("sl"))
          .select(transform(col("sl"), x => x.getField("mean_b")).as("l"))
          .select(
            aggregate(col("l"), lit(0.0), (a, x) => a + x).as("s1"),
            aggregate(col("l"), lit(0.0), (a, x) => a + x * x).as("s2"))
        val pt = o.agg((sum(floor(col("o_totalprice") * 100 + 0.5)
            .cast("bigint")).cast("double") / count(lit(1))).as("point_mean"))
        pt.crossJoin(folds)
          .select((col("point_mean") / 100.0).as("point_mean"),
            (col("s1") / 16.0 / 100.0).as("boot_mean"),
            (sqrt((col("s2") - col("s1") * col("s1") / 16.0) / 15.0) / 100.0)
              .as("boot_se"))
      }),

    // ---- WEIGHTED median per group (weight = quantity, value =
    // price): the lower weighted median is the smallest value whose
    // cumulative weight reaches half the group total — the summary a
    // volume-weighted pricing report needs where the plain median
    // over-counts single-unit lines. Same histogram-rank shape as
    // q_agg_winsorize but the histogram carries sum(weight) instead of
    // count(*): one full-data shuffle builds the weighted histogram,
    // the sharded two-phase cumsum ranks it (parallelism scales with
    // the value range, not the group count), and 2·cum ≥ total picks
    // the boundary with zero divisions. Quantities are integral by
    // fixture contract, so CAST is exact. ----
    QueryDef("q_agg_weighted_median", Some(
      """WITH t AS (
        |  SELECT l_returnflag AS rf,
        |    CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS cents,
        |    CAST(l_quantity AS BIGINT) AS w
        |  FROM lineitem),
        |h AS (SELECT rf, cents, CAST(sum(w) AS BIGINT) AS w
        |      FROM t GROUP BY rf, cents),
        |r AS (
        |  SELECT rf, cents,
        |    CAST(sum(w) OVER (PARTITION BY rf ORDER BY cents) AS BIGINT)
        |      AS cum,
        |    CAST(sum(w) OVER (PARTITION BY rf) AS BIGINT) AS tot
        |  FROM h)
        |SELECT rf, CAST(min(tot) AS BIGINT) AS total_weight,
        |  min(CASE WHEN 2 * cum >= tot THEN cents END) / 100.0
        |    AS weighted_median
        |FROM r GROUP BY rf""".stripMargin))(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val h = Tables(s, d, "lineitem")
          .select(col("l_returnflag").as("rf"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("bigint")
              .as("cents"),
            col("l_quantity").cast("bigint").as("w"))
          .groupBy(col("rf"), col("cents")).agg(sum(col("w")).as("w"))
          .withColumn("shard", expr("cents DIV 65536"))
        val wLoc = Window.partitionBy(col("rf"), col("shard"))
          .orderBy(col("cents"))
        val local = h.withColumn("lcum", sum(col("w")).over(wLoc))
        val wSh = Window.partitionBy(col("rf")).orderBy(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wAll = Window.partitionBy(col("rf"))
        val offs = h.groupBy(col("rf"), col("shard"))
          .agg(sum(col("w")).as("stot"))
          .withColumn("off", coalesce(sum(col("stot")).over(wSh), lit(0L)))
          .withColumn("tot", sum(col("stot")).over(wAll))
          .select(col("rf"), col("shard"), col("off"), col("tot"))
        local.join(broadcast(offs), Seq("rf", "shard"))
          .withColumn("cum", col("lcum") + col("off"))
          .groupBy(col("rf"))
          .agg(min(col("tot")).cast("bigint").as("total_weight"),
            (min(when(lit(2) * col("cum") >= col("tot"), col("cents")))
              / 100.0).as("weighted_median"))
      }),

    // ---- exact distributed OLS (y = a + b·x per return flag):
    // slope / intercept / r² from the closed-form moment sums — the
    // one-pass parallel-regression shape (a single partial+final hash
    // agg collects n, Σx, Σy, Σx², Σxy, Σy²; no covariance UDAF, no
    // second scan, no centering pass). x is the integer quantity and
    // y integer cents, and every moment accumulates EXACTLY in
    // DECIMAL(38,0) (HUGEINT on the oracle side — Σy² alone exceeds
    // int64 at sf0.1), so the sums are order-independent under any
    // partitioning. The final ratios are formed from the exact
    // integers with single correctly-rounded double ops; the >2^53
    // wide-integer→DOUBLE cast parity is the chi-square precedent. ----
    QueryDef("q_agg_regression", Some(
      """WITH p AS (
        |  SELECT l_returnflag AS rf,
        |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS y
        |  FROM lineitem),
        |m AS (
        |  SELECT rf, count(*) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    sum(CAST(x AS HUGEINT)*x) AS sxx,
        |    sum(CAST(x AS HUGEINT)*y) AS sxy,
        |    sum(CAST(y AS HUGEINT)*y) AS syy
        |  FROM p GROUP BY rf)
        |SELECT rf, n,
        |  CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
        |    AS slope,
        |  (CAST(sy AS DOUBLE)
        |     - CAST(n*sxy - sx*sy AS DOUBLE)
        |       / CAST(n*sxx - sx*sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE) AS intercept,
        |  (CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE))
        |    / (CAST(n*sxx - sx*sx AS DOUBLE)
        |       * CAST(n*syy - sy*sy AS DOUBLE)) AS r2
        |FROM m""".stripMargin))(
      (s, d) => {
        val p = Tables(s, d, "lineitem").select(
          col("l_returnflag").as("rf"),
          floor(col("l_quantity") + 0.5).cast("bigint").as("x"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("bigint").as("y"))
        val m = p.groupBy(col("rf")).agg(
          count(lit(1)).as("n"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
          sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
          sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
        val nD = col("n").cast("decimal(38,0)")
        val num = (nD * col("sxy") - col("sx") * col("sy")).cast("double")
        val denx = (nD * col("sxx") - col("sx") * col("sx")).cast("double")
        val deny = (nD * col("syy") - col("sy") * col("sy")).cast("double")
        m.select(col("rf"), col("n"),
          (num / denx).as("slope"),
          ((col("sy").cast("double") - num / denx * col("sx").cast("double"))
            / col("n").cast("double")).as("intercept"),
          ((num * num) / (denx * deny)).as("r2"))
      }),

    // ---- Benford first-digit audit: the classic fabricated-data /
    // corruption screen over a spanning-several-decades money column.
    // The first significant digit comes from the BIGINT→string cast
    // (no logarithms on data); the Benford expectations log10(1+1/d)
    // are compile-time constants embedded as the SAME 1e9-scaled
    // integer literals in both dialects (the nDCG-discount trick), so
    // deviation stays an exact BIGINT and each χ² contribution is one
    // DECIMAL(38,0) square divided out in a single double op. Scale:
    // one scan into a 9-row aggregate — map-side combined, no sort. ----
    QueryDef("q_profile_benford", Some {
      val pE9 = (1 to 9).map(dd =>
        math.floor(math.log10(1.0 + 1.0 / dd) * 1e9 + 0.5).toLong)
      s"""WITH t AS (
         |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
         |    AS VARCHAR), 1, 1) AS BIGINT) AS digit
         |  FROM orders WHERE o_totalprice >= 1),
         |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
         |      FROM t GROUP BY digit),
         |n AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM g),
         |e AS (
         |  SELECT digit, n_obs, n.n,
         |    CAST(([${pE9.mkString(", ")}])[CAST(digit AS INT)] AS BIGINT)
         |      AS p_e9
         |  FROM g, n)
         |SELECT digit, n_obs, p_e9,
         |  CAST(n_obs*1000000000 - n*p_e9 AS BIGINT) AS dev_e9,
         |  CAST(
         |    (CAST(n_obs AS HUGEINT)*1000000000 - CAST(n AS HUGEINT)*p_e9)
         |    * (CAST(n_obs AS HUGEINT)*1000000000 - CAST(n AS HUGEINT)*p_e9)
         |    AS DOUBLE)
         |    / (CAST(n AS DOUBLE) * p_e9 * 1000000000) AS chi2_contrib
         |FROM e""".stripMargin
    })(
      (s, d) => {
        val pE9 = (1 to 9).map(dd =>
          math.floor(math.log10(1.0 + 1.0 / dd) * 1e9 + 0.5).toLong)
        val g = Tables(s, d, "orders")
          // the digit extraction assumes a value in [1, ∞): below 1 the
          // first character is '0' (element_at index 0 throws where
          // DuckDB list[0] is NULL) and a negative sign breaks the
          // BIGINT cast — make the domain assumption explicit in BOTH
          // dialects rather than relying on fixture ranges
          .where(col("o_totalprice") >= 1)
          .select(substring(floor(col("o_totalprice")).cast("bigint")
            .cast("string"), 1, 1).cast("bigint").as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
        val n = g.agg(sum(col("n_obs")).cast("bigint").as("n"))
        val dev = col("n_obs").cast("decimal(38,0)") * 1000000000L -
          col("n").cast("decimal(38,0)") * col("p_e9")
        g.crossJoin(broadcast(n))
          .withColumn("p_e9",
            element_at(array(pE9.map(lit): _*), col("digit").cast("int")))
          .select(col("digit"), col("n_obs"), col("p_e9"),
            (col("n_obs") * 1000000000L - col("n") * col("p_e9"))
              .cast("bigint").as("dev_e9"),
            ((dev * dev).cast("double")
              / (col("n").cast("double") * col("p_e9") * 1000000000L))
              .as("chi2_contrib"))
      }),

    // ---- Simpson diversity index per column (profiling): the
    // probability two random rows share a value, Σnᵢ(nᵢ−1)/(N(N−1)) —
    // the log-free concentration statistic (entropy needs
    // transcendentals, banned by the parity rules; Simpson is an
    // exact rational → 1e9-scaled integer). High for near-constant
    // columns, →0 for key-like ones: the profiler signal that picks
    // dictionary-encoding, skew-salting and stats collection
    // candidates. Σnᵢ(nᵢ−1) exceeds int64 at scale — accumulated in
    // DECIMAL(38,0)/HUGEINT, one division at the end. Scale: one
    // union-scan + per-column histogram agg; output = 3 rows. ----
    QueryDef("q_profile_simpson", Some(
      """WITH vals AS (
        |  SELECT 'o_orderstatus' AS col_name, o_orderstatus AS val
        |  FROM orders
        |  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
        |  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR)
        |  FROM orders),
        |h AS (SELECT col_name, val, count(*) AS cnt FROM vals GROUP BY 1, 2)
        |SELECT col_name, CAST(sum(cnt) AS BIGINT) AS n,
        |  count(*) AS n_distinct,
        |  CAST((1000000000 * sum(cnt * (cnt - 1)))
        |    // (CAST(sum(cnt) AS HUGEINT) * (sum(cnt) - 1)) AS BIGINT)
        |    AS simpson_e9
        |FROM h GROUP BY col_name""".stripMargin))(
      (s, d) => {
        def colVals(name: String, c: org.apache.spark.sql.Column) =
          Tables(s, d, "orders").select(lit(name).as("col_name"),
            c.cast("string").as("val"))
        colVals("o_orderstatus", col("o_orderstatus"))
          .unionAll(colVals("o_orderpriority", col("o_orderpriority")))
          .unionAll(colVals("o_custkey", col("o_custkey")))
          .groupBy(col("col_name"), col("val"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("col_name"))
          .agg(sum(col("cnt")).as("n"), count(lit(1)).as("n_distinct"),
            sum((col("cnt") * (col("cnt") - 1)).cast("decimal(38,0)"))
              .as("ss"))
          .select(col("col_name"), col("n"), col("n_distinct"),
            expr("CAST((1000000000 * ss) DIV (CAST(n AS DECIMAL(38,0))" +
              " * (n - 1)) AS BIGINT)").as("simpson_e9"))
      }),

    // ---- median absolute deviation (MAD) per priority class: the
    // robust dispersion statistic (insensitive to the outliers that
    // drive stddev) — two chained EXACT median passes, each the
    // integer histogram-rank shape (2·cum ≥ tot over per-(group,
    // value) counts, never per-row sorting): first the cents median,
    // then the median of |cents − median|. Scale: both windows run
    // over HISTOGRAM rows (distinct values per group, not rows); the
    // tiny per-group median table broadcasts back between passes. ----
    QueryDef("q_agg_mad", Some(
      """WITH t AS (
        |  SELECT o_orderpriority AS pri,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |h1 AS (SELECT pri, cents, count(*) AS w FROM t GROUP BY 1, 2),
        |r1 AS (SELECT pri, cents,
        |         CAST(sum(w) OVER (PARTITION BY pri ORDER BY cents)
        |           AS BIGINT) AS cum,
        |         CAST(sum(w) OVER (PARTITION BY pri) AS BIGINT) AS tot
        |       FROM h1),
        |med AS (SELECT pri, CAST(min(tot) AS BIGINT) AS n,
        |          min(CASE WHEN 2 * cum >= tot THEN cents END) AS m
        |        FROM r1 GROUP BY pri),
        |h2 AS (SELECT t.pri, abs(t.cents - med.m) AS dev, count(*) AS w
        |       FROM t JOIN med ON t.pri = med.pri GROUP BY 1, 2),
        |r2 AS (SELECT pri, dev,
        |         CAST(sum(w) OVER (PARTITION BY pri ORDER BY dev)
        |           AS BIGINT) AS cum,
        |         CAST(sum(w) OVER (PARTITION BY pri) AS BIGINT) AS tot
        |       FROM h2)
        |SELECT r2.pri AS o_orderpriority, med.n,
        |  med.m / 100.0 AS median_price,
        |  min(CASE WHEN 2 * r2.cum >= r2.tot THEN r2.dev END) / 100.0
        |    AS mad_price
        |FROM r2 JOIN med ON r2.pri = med.pri
        |GROUP BY r2.pri, med.n, med.m""".stripMargin))(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val t = Tables(s, d, "orders")
          .select(col("o_orderpriority").as("pri"),
            floor(col("o_totalprice") * 100 + 0.5).cast("bigint")
              .as("cents"))
          .persist() // both median passes scan it
        def medianOf(vals: DataFrame, vc: String): DataFrame = {
          val h = vals.groupBy(col("pri"), col(vc))
            .agg(count(lit(1)).as("w"))
          val wOrd = Window.partitionBy(col("pri")).orderBy(col(vc))
          val wAll = Window.partitionBy(col("pri"))
          h.withColumn("cum", sum(col("w")).over(wOrd))
            .withColumn("tot", sum(col("w")).over(wAll))
            .groupBy(col("pri"))
            .agg(min(col("tot")).cast("bigint").as("n"),
              min(when(lit(2) * col("cum") >= col("tot"), col(vc)))
                .as("m"))
        }
        // pin the 5-row median table: it is joined twice (building the
        // deviations AND decorating the final output) and broadcast
        // subtree reuse does not fire across the two joins — without
        // the pin the whole first median pass runs twice (measured)
        val med = medianOf(t, "cents").persist()
        val dev = t.join(broadcast(med), "pri")
          .select(col("pri"), abs(col("cents") - col("m")).as("dev"))
        medianOf(dev, "dev").as("m2")
          .join(broadcast(med).as("m1"), "pri")
          .select(col("pri").as("o_orderpriority"), col("m1.n").as("n"),
            (col("m1.m") / 100.0).as("median_price"),
            (col("m2.m") / 100.0).as("mad_price"))
      })
  )

  /** The constraint suite's DuckDB twin — also reused as a building
    * block by the migration-readiness e2e report. */
  private[queries] lazy val constraintsSql: String =
    """WITH u AS (
      |  SELECT CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v
      |  FROM orders),
      |fk AS (
      |  SELECT CAST(count(*) AS BIGINT) AS v
      |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_orderkey IS NULL),
      |nn AS (
      |  SELECT CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS v FROM customer),
      |rng AS (
      |  SELECT CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1
      |    THEN 1 ELSE 0 END) AS BIGINT) AS v FROM lineitem),
      |dom AS (
      |  SELECT CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS v FROM orders)
      |SELECT 'orders_pk_unique' AS constraint_name, v AS violations,
      |  v = 0 AS passed FROM u
      |UNION ALL SELECT 'lineitem_fk_orders', v, v = 0 FROM fk
      |UNION ALL SELECT 'customer_acctbal_nonnull', v, v = 0 FROM nn
      |UNION ALL SELECT 'lineitem_discount_range', v, v = 0 FROM rng
      |UNION ALL SELECT 'orders_status_domain', v, v = 0 FROM dom"""
      .stripMargin

  /** Spark side of the constraint suite, shared with the readiness
    * e2e. */
  private[queries] def constraintsReport(
      s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    def report(name: String, v: org.apache.spark.sql.DataFrame) =
      v.select(lit(name).as("constraint_name"),
        col("v").cast("bigint").as("violations"),
        (col("v") === 0).as("passed"))
    val orders = Tables(s, d, "orders")
    val lineitem = Tables(s, d, "lineitem")
    val u = orders.agg(
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v"))
    val fk = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
    val nn = Tables(s, d, "customer").agg(
      sum(when(col("c_acctbal").isNull, 1L).otherwise(0L)).as("v"))
    val rng = lineitem.agg(
      sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.1, 1L)
        .otherwise(0L)).as("v"))
    val dom = orders.agg(
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
        .otherwise(0L)).as("v"))
    report("orders_pk_unique", u)
      .unionByName(report("lineitem_fk_orders", fk))
      .unionByName(report("customer_acctbal_nonnull", nn))
      .unionByName(report("lineitem_discount_range", rng))
      .unionByName(report("orders_status_domain", dom))
  }
}
