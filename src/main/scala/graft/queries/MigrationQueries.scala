package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.TextOps.{h32, h32Sql}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Migration-validation operators — the checks a user of the
  * reference (an Oracle→Cassandra bulk mover) runs AFTER a transfer
  * to prove the copy is faithful, re-expressed as Spark plans that
  * hold at 100 TB:
  *
  *  - FK integrity audit: orphan counts per relationship via LEFT
  *    ANTI joins (each one shuffle or a dim broadcast — never a
  *    row-by-row probe loop).
  *  - bucketed content checksum: per-bucket row counts + an
  *    order-independent hash SUM over a canonicalized row string.
  *    Comparing per-bucket digests of source and target localizes a
  *    divergence to 1/B of the data without ever co-locating the two
  *    tables row-by-row — the standard reconciliation shape when a
  *    full row-join is unaffordable.
  *  - SCD2 merge: apply a change batch to a dimension producing
  *    validity intervals — one equi-join plus a single explode pass
  *    (never one scan per output branch).
  *
  * The fixture has no second "target" copy, so the checksum/audit run
  * against the source tables themselves; the operator shape (and the
  * oracle contract) is identical when the second side is a real
  * target. Canonical strings stringify only through engine-stable
  * types (BIGINT, DECIMAL(18,2), epoch micros) per the parity rules.
  */
object MigrationQueries {

  private val checksumBuckets = 64

  /** Shared by q_migrate_pii_mask and q_migrate_governance_e2e (the
    * e2e wraps this definition on both the plan and the oracle side,
    * so the composed report can never drift from the mask it audits). */
  private val piiMaskSql =
    """SELECT c_custkey,
      |  md5(c_name) AS name_surrogate,
      |  regexp_replace(c_name, '[0-9]', 'X', 'g') AS name_masked,
      |  CAST(floor(c_acctbal / 1000.0) * 1000 AS BIGINT) AS acctbal_band,
      |  c_mktsegment
      |FROM customer""".stripMargin

  private def piiMask(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables(s, d, "customer").select(
      col("c_custkey"),
      md5(col("c_name")).as("name_surrogate"),
      regexp_replace(col("c_name"), "[0-9]", "X").as("name_masked"),
      (floor(col("c_acctbal") / lit(1000.0)) * 1000).cast("bigint")
        .as("acctbal_band"),
      col("c_mktsegment"))
  /** SCD2 change-batch effective time: 2000-01-01T00:00:00Z. */
  private val scd2Tus = 946684800000000L

  val defs: Seq[QueryDef] = Seq(

    // ---- FK integrity audit: one row per relationship ----
    QueryDef("q_migrate_fk_audit", Some(
      """SELECT 'lineitem_orders' AS fk,
        |  (SELECT count(*) FROM lineitem) AS child_rows,
        |  (SELECT count(*) FROM lineitem l LEFT JOIN orders o
        |     ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) AS orphans
        |UNION ALL
        |SELECT 'orders_customer',
        |  (SELECT count(*) FROM orders),
        |  (SELECT count(*) FROM orders o LEFT JOIN customer c
        |     ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
        |UNION ALL
        |SELECT 'lineitem_part',
        |  (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem l LEFT JOIN part p
        |     ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL)
        |UNION ALL
        |SELECT 'lineitem_supplier',
        |  (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem l LEFT JOIN supplier s
        |     ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL)""".stripMargin))(
      (s, d) => {
        def audit(fk: String, child: String, childKey: String,
            parent: String, parentKey: String) = {
          val c = Tables(s, d, child)
          val rows = c.agg(count(lit(1)).as("child_rows"))
          val orph = c.join(Tables(s, d, parent),
              col(childKey) === col(parentKey), "left_anti")
            .agg(count(lit(1)).as("orphans"))
          rows.crossJoin(orph).select(lit(fk).as("fk"),
            col("child_rows"), col("orphans"))
        }
        audit("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey")
          .unionAll(audit("orders_customer", "orders", "o_custkey",
            "customer", "c_custkey"))
          .unionAll(audit("lineitem_part", "lineitem", "l_partkey",
            "part", "p_partkey"))
          .unionAll(audit("lineitem_supplier", "lineitem", "l_suppkey",
            "supplier", "s_suppkey"))
      }),

    // ---- bucketed content checksum over orders ----
    QueryDef("q_migrate_checksum", Some {
      val canon = "concat_ws('|', CAST(o_orderkey AS VARCHAR), " +
        "CAST(o_custkey AS VARCHAR), o_orderstatus, " +
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), " +
        "CAST(epoch_us(o_orderdate) AS VARCHAR), o_orderpriority)"
      s"""SELECT o_orderkey % $checksumBuckets AS bucket,
         |  count(*) AS n_rows,
         |  CAST(sum(${h32Sql(canon)}) AS BIGINT) AS digest
         |FROM orders
         |GROUP BY o_orderkey % $checksumBuckets""".stripMargin
    })(
      (s, d) => {
        val canon = concat_ws("|",
          col("o_orderkey").cast("string"),
          col("o_custkey").cast("string"),
          col("o_orderstatus"),
          col("o_totalprice").cast("decimal(18,2)").cast("string"),
          unix_micros(col("o_orderdate").cast("timestamp")).cast("string"),
          col("o_orderpriority"))
        Tables(s, d, "orders")
          .groupBy(pmod(col("o_orderkey"), lit(checksumBuckets.toLong)).as("bucket"))
          // h32 < 2^32 and SUM is order-independent: the digest is
          // partial-aggregable map-side and safe to ~2^31 rows/bucket
          .agg(count(lit(1)).as("n_rows"), sum(h32(canon)).as("digest"))
      }),

    // ---- SCD2 merge: one join, one explode, 1-or-2 rows per key ----
    QueryDef("q_scd2_merge", Some(
      s"""WITH delta AS (
         |  SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 7 = 0)
         |SELECT o_orderkey, o_orderstatus AS status,
         |  epoch_us(o_orderdate) AS valid_from_us,
         |  CAST($scd2Tus AS BIGINT) AS valid_to_us
         |FROM orders JOIN delta ON o_orderkey = k
         |UNION ALL
         |SELECT o_orderkey, 'X', CAST($scd2Tus AS BIGINT), CAST(NULL AS BIGINT)
         |FROM orders JOIN delta ON o_orderkey = k
         |UNION ALL
         |SELECT o_orderkey, o_orderstatus, epoch_us(o_orderdate),
         |  CAST(NULL AS BIGINT)
         |FROM orders LEFT JOIN delta ON o_orderkey = k
         |WHERE k IS NULL""".stripMargin))(
      (s, d) => {
        val base = Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
        val delta = base.where(pmod(col("o_orderkey"), lit(7L)) === 0)
          .select(col("o_orderkey").as("k"))
        val nullUs = lit(null).cast("bigint")
        // single pass over the joined frame: updated keys emit
        // (closed old interval, open new version); others emit one
        // open row — no per-branch rescan of the base table
        base.join(delta, col("o_orderkey") === col("k"), "left")
          .select(col("o_orderkey"), explode(when(col("k").isNotNull,
            array(
              struct(col("o_orderstatus").as("status"),
                col("od_us").as("valid_from_us"),
                lit(scd2Tus).as("valid_to_us")),
              struct(lit("X").as("status"),
                lit(scd2Tus).as("valid_from_us"),
                nullUs.as("valid_to_us"))))
            .otherwise(array(
              struct(col("o_orderstatus").as("status"),
                col("od_us").as("valid_from_us"),
                nullUs.as("valid_to_us"))))).as("v"))
          .select(col("o_orderkey"), col("v.status").as("status"),
            col("v.valid_from_us").as("valid_from_us"),
            col("v.valid_to_us").as("valid_to_us"))
      }),

    // ---- POINT-IN-TIME join against the SCD2 dimension: each
    // lineitem is enriched with the order VERSION valid at its ship
    // time — the temporal-correctness query every versioned warehouse
    // must answer ("what did the dimension say WHEN this happened"),
    // and the reason SCD2 intervals exist at all. Plan: an equi-join
    // on the order key carries the interval predicate as a residual
    // (versions per key are 1-2, so the residual filters a constant
    // fanout — no band join needed when the version count is
    // bounded); facts that predate every version survive via the
    // left join's '<none>' row. Money sums in DECIMAL as usual. ----
    QueryDef("q_scd2_pit", Some(
      s"""WITH delta AS (
         |  SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 7 = 0),
         |scd AS (
         |  SELECT o_orderkey, o_orderstatus AS status,
         |    epoch_us(o_orderdate) AS valid_from_us,
         |    CAST($scd2Tus AS BIGINT) AS valid_to_us
         |  FROM orders JOIN delta ON o_orderkey = k
         |  UNION ALL
         |  SELECT o_orderkey, 'X', CAST($scd2Tus AS BIGINT), CAST(NULL AS BIGINT)
         |  FROM orders JOIN delta ON o_orderkey = k
         |  UNION ALL
         |  SELECT o_orderkey, o_orderstatus, epoch_us(o_orderdate),
         |    CAST(NULL AS BIGINT)
         |  FROM orders LEFT JOIN delta ON o_orderkey = k
         |  WHERE k IS NULL),
         |li AS (
         |  SELECT l_orderkey, epoch_us(l_shipdate) AS ship_us,
         |    CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS cents
         |  FROM lineitem)
         |SELECT coalesce(scd.status, '<none>') AS status,
         |  count(*) AS n_lines,
         |  CAST(sum(li.cents) AS DOUBLE) / 100.0 AS total_value
         |FROM li LEFT JOIN scd ON scd.o_orderkey = li.l_orderkey
         |  AND scd.valid_from_us <= li.ship_us
         |  AND (scd.valid_to_us IS NULL OR li.ship_us < scd.valid_to_us)
         |GROUP BY coalesce(scd.status, '<none>')""".stripMargin))(
      (s, d) => {
        val base = Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
        val delta = base.where(pmod(col("o_orderkey"), lit(7L)) === 0)
          .select(col("o_orderkey").as("k"))
        val nullUs = lit(null).cast("bigint")
        val scd = base.join(delta, col("o_orderkey") === col("k"), "left")
          .select(col("o_orderkey"), explode(when(col("k").isNotNull,
            array(
              struct(col("o_orderstatus").as("status"),
                col("od_us").as("valid_from_us"),
                lit(scd2Tus).as("valid_to_us")),
              struct(lit("X").as("status"),
                lit(scd2Tus).as("valid_from_us"),
                nullUs.as("valid_to_us"))))
            .otherwise(array(
              struct(col("o_orderstatus").as("status"),
                col("od_us").as("valid_from_us"),
                nullUs.as("valid_to_us"))))).as("v"))
          .select(col("o_orderkey"), col("v.status").as("status"),
            col("v.valid_from_us").as("vf"), col("v.valid_to_us").as("vt"))
        val li = Tables(s, d, "lineitem")
          .select(col("l_orderkey"),
            unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("bigint").as("cents"))
        li.join(scd,
            col("o_orderkey") === col("l_orderkey")
              && col("vf") <= col("ship_us")
              && (col("vt").isNull || col("ship_us") < col("vt")),
            "left")
          .groupBy(coalesce(col("status"), lit("<none>")).as("status"))
          .agg(count(lit(1)).as("n_lines"),
            (sum(col("cents").cast("decimal(28,0)")).cast("double") / 100.0)
              .as("total_value"))
      }),

    // ---- snapshot diff: added / removed / changed / unchanged per
    // source between two corpus versions — the dataset-versioning
    // report every reproducible training pipeline publishes per
    // release. The two snapshots are modeled as deterministic slices
    // of the fixture (docs ≡0 mod 23 are "new in B", ≡0 mod 17
    // "removed in B", ≡0 mod 13 carry changed content — reverse(text)
    // stands in for the edit); with real before/after tables the plan
    // is identical. Shape: one full-outer equi-join on the doc key
    // (each side shuffles once), content compared by h32 digest —
    // never row-strings across the wire — then a |sources|-cardinality
    // count-FILTER aggregate. ----
    QueryDef("q_migrate_snapshot_diff", Some(
      s"""WITH a AS (
         |  SELECT doc_id, source, ${h32Sql("text")} AS h
         |  FROM documents WHERE doc_id % 23 <> 0),
         |b AS (
         |  SELECT doc_id, source,
         |    CASE WHEN doc_id % 13 = 0 THEN ${h32Sql("reverse(text)")}
         |         ELSE ${h32Sql("text")} END AS h
         |  FROM documents WHERE doc_id % 17 <> 0)
         |SELECT coalesce(a.source, b.source) AS source,
         |  count(CASE WHEN a.doc_id IS NULL THEN 1 END) AS n_added,
         |  count(CASE WHEN b.doc_id IS NULL THEN 1 END) AS n_removed,
         |  count(CASE WHEN a.doc_id IS NOT NULL AND b.doc_id IS NOT NULL
         |    AND a.h <> b.h THEN 1 END) AS n_changed,
         |  count(CASE WHEN a.h = b.h THEN 1 END) AS n_unchanged
         |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
         |GROUP BY coalesce(a.source, b.source)""".stripMargin))(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val a = docs.where(pmod(col("doc_id"), lit(23L)) =!= 0)
          .select(col("doc_id").as("a_id"), col("source").as("a_src"),
            h32(col("text")).as("a_h"))
        val b = docs.where(pmod(col("doc_id"), lit(17L)) =!= 0)
          .select(col("doc_id").as("b_id"), col("source").as("b_src"),
            when(pmod(col("doc_id"), lit(13L)) === 0, h32(reverse(col("text"))))
              .otherwise(h32(col("text"))).as("b_h"))
        a.join(b, col("a_id") === col("b_id"), "full_outer")
          .groupBy(coalesce(col("a_src"), col("b_src")).as("source"))
          .agg(count(when(col("a_id").isNull, 1)).as("n_added"),
            count(when(col("b_id").isNull, 1)).as("n_removed"),
            count(when(col("a_id").isNotNull && col("b_id").isNotNull
              && col("a_h") =!= col("b_h"), 1)).as("n_changed"),
            count(when(col("a_h") === col("b_h"), 1)).as("n_unchanged"))
      }),

    // ---- PII masking: the data-governance pass a regulated migration
    // runs in flight (GDPR/CCPA pseudonymization). Direct identifier
    // (c_name) becomes a deterministic md5 surrogate (joinable across
    // tables, not reversible) plus a digit-masked display form; the
    // sensitive numeric (c_acctbal) is generalized to a 1000-wide band.
    // Pure stateless projection — every function codegen'd, zero
    // shuffles, trivially 100 TB-safe (and exactly where it belongs:
    // fused into the migration scan so raw PII never lands on the
    // target). floor(x/1000) is the same IEEE divide+floor in both
    // engines, so banding is oracle-exact. ----
    QueryDef("q_migrate_pii_mask", Some(piiMaskSql))((s, d) => piiMask(s, d)),

    // ---- k-anonymity / l-diversity audit over the quasi-identifier
    // (c_nationkey, c_mktsegment): one row per equivalence class with
    // its size, the diversity of the sensitive attribute (distinct
    // acctbal bands), and a violation flag for classes smaller than
    // k=5 — the re-identification risk report run before releasing a
    // masked copy. One hash-shuffle groupBy with partial aggregation;
    // the distinct is per-class (bounded band domain), so no second
    // expand pass is needed at scale. ----
    QueryDef("q_privacy_k_anon", Some(
      """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
        |  count(*) AS class_size,
        |  count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) AS l_diversity,
        |  CAST(CASE WHEN count(*) < 5 THEN 1 ELSE 0 END AS BIGINT) AS violates_k
        |FROM customer
        |GROUP BY c_nationkey, c_mktsegment""".stripMargin))(
      (s, d) =>
        Tables(s, d, "customer")
          .groupBy(col("c_nationkey").cast("bigint").as("c_nationkey"),
            col("c_mktsegment"))
          .agg(count(lit(1)).as("class_size"),
            countDistinct(floor(col("c_acctbal") / lit(1000.0))).as("l_diversity"))
          .withColumn("violates_k",
            when(col("class_size") < 5, 1L).otherwise(0L))),

    // ---- composed governance e2e: mask → k-anonymity audit of the
    // MASKED copy → per-segment transfer digest, one DAG (the
    // pre-release report a regulated migration ships with the data).
    // Both plan and oracle wrap the q_migrate_pii_mask definition, so
    // the report can never drift from the mask it audits. The digest
    // is the order-independent h32 SUM over the canonical masked row
    // string (same reconciliation shape as q_migrate_checksum): the
    // receiving side recomputes it from what actually landed. One
    // stateless projection + two segment-keyed aggregates. ----
    QueryDef("q_migrate_governance_e2e", Some(
      s"""WITH m AS ($piiMaskSql),
         |chk AS (
         |  SELECT c_mktsegment, count(*) AS n_rows,
         |    CAST(sum(${h32Sql("concat_ws('|', CAST(c_custkey AS VARCHAR), " +
                "name_surrogate, name_masked, CAST(acctbal_band AS VARCHAR))")})
         |      AS BIGINT) AS digest
         |  FROM m GROUP BY c_mktsegment),
         |cls AS (
         |  SELECT c_mktsegment, acctbal_band, count(*) AS sz
         |  FROM m GROUP BY c_mktsegment, acctbal_band)
         |SELECT k.c_mktsegment, chk.n_rows, chk.digest,
         |  k.n_classes, k.n_violating
         |FROM (SELECT c_mktsegment, count(*) AS n_classes,
         |        CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
         |          AS n_violating
         |      FROM cls GROUP BY c_mktsegment) k
         |JOIN chk ON chk.c_mktsegment = k.c_mktsegment""".stripMargin))(
      (s, d) => {
        val m = piiMask(s, d).persist()
        val chk = m.groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_rows"),
            sum(h32(concat_ws("|", col("c_custkey").cast("string"),
              col("name_surrogate"), col("name_masked"),
              col("acctbal_band").cast("string")))).as("digest"))
        val cls = m.groupBy(col("c_mktsegment"), col("acctbal_band"))
          .agg(count(lit(1)).as("sz"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_classes"),
            sum(when(col("sz") < 5, 1L).otherwise(0L)).as("n_violating"))
        cls.join(chk, "c_mktsegment")
          .select(col("c_mktsegment"), col("n_rows"), col("digest"),
            col("n_classes"), col("n_violating"))
      }),

    // ---- keyset-paginated export batching: split a keyed table into
    // exactly-N-row batches in key order, each with its [lo, hi]
    // cursor — the resumable unit a bulk loader (the reference's
    // actual job, py:347-353) writes per round-trip, and the cursor
    // it restarts from after a failure. Ranks come from the two-phase
    // sharded pattern (per-shard row_number + broadcast offsets, the
    // key being dense-agnostic), so batch assignment never needs a
    // global sort: parallelism scales with the key range. Batches
    // are contiguous and disjoint by construction; the oracle pins
    // sizes and cursor bounds exactly. ----
    // ---- dead-letter-queue routing (the remediation half of the
    // constraint suite): every fact row is routed 'main' or 'dlq'
    // with ONE reason code picked by PRECEDENCE — referential orphan
    // first, then the policy gates (discount cap, quantity cap,
    // price cap) — exactly the quarantine split a production loader
    // writes next to its main sink so bad rows never block the batch
    // and every reject is replayable. The report carries per-reason
    // row/order counts plus min/max order keys (the replay cursor).
    // Scale: one equi-join against orders (broadcast or key-
    // partitioned) and one hash aggregate; the CASE precedence is a
    // codegen'd projection. Comparisons are on the fixture's exact
    // 2-decimal doubles, so routing is bit-identical cross-engine. ----
    QueryDef("q_migrate_dlq_routing", Some(
      """WITH r AS (
        |  SELECT l.l_orderkey,
        |    CASE
        |      WHEN o.o_orderkey IS NULL THEN 'orphan_order'
        |      WHEN l.l_discount > 0.08 THEN 'discount_above_8pct'
        |      WHEN l.l_quantity > 45 THEN 'qty_above_45'
        |      WHEN l.l_extendedprice > 80000 THEN 'price_above_80k'
        |      ELSE 'pass' END AS reason
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT CASE WHEN reason = 'pass' THEN 'main' ELSE 'dlq' END AS route,
        |  reason, count(*) AS n_rows,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        |  min(l_orderkey) AS min_orderkey, max(l_orderkey) AS max_orderkey
        |FROM r GROUP BY 1, 2""".stripMargin))(
      (s, d) => {
        val l = Tables(s, d, "lineitem")
        val o = Tables(s, d, "orders").select(col("o_orderkey"))
        val reason =
          when(col("o_orderkey").isNull, "orphan_order")
            .when(col("l_discount") > 0.08, "discount_above_8pct")
            .when(col("l_quantity") > 45, "qty_above_45")
            .when(col("l_extendedprice") > 80000, "price_above_80k")
            .otherwise("pass")
        l.join(o, l("l_orderkey") === o("o_orderkey"), "left")
          .select(col("l_orderkey"), reason.as("reason"))
          .groupBy(
            when(col("reason") === "pass", "main").otherwise("dlq")
              .as("route"),
            col("reason"))
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("l_orderkey")).as("n_orders"),
            min(col("l_orderkey")).as("min_orderkey"),
            max(col("l_orderkey")).as("max_orderkey"))
      }),

    QueryDef("q_migrate_export_batches", Some(exportBatchesSql))(
      (s, d) =>
        exportBatches(
          Tables(s, d, "orders").select(col("o_orderkey").as("key")))),

    // ---- migration-readiness report: the pre-cutover composition —
    // (1) the declarative constraint gate must be all-green, (2) the
    // keyset export plan must be exactly sized, (3) the layout audit
    // must justify (or reject) a z-order rewrite of the target — all
    // reusing the same catalog building blocks (constraintsSql /
    // exportBatchesSql / zorderSql verbatim on the oracle side, the
    // shared Spark helpers on the engine side), so the e2e can never
    // drift from the operators it composes. One row per check:
    // (check_name, metric, passed). ----
    QueryDef("q_migrate_readiness_e2e", Some(
      s"""WITH con AS (SELECT * FROM (${AggregateQueries.constraintsSql}) x),
         |bat AS (SELECT * FROM ($exportBatchesSql) x),
         |zz AS (SELECT * FROM (${LayoutQueries.zorderSql}) x)
         |SELECT 'constraints_green' AS check_name,
         |  CAST((SELECT sum(violations) FROM con) AS BIGINT) AS metric,
         |  (SELECT count(*) FROM con WHERE NOT passed) = 0 AS passed
         |UNION ALL
         |SELECT 'export_plan_sized',
         |  CAST((SELECT count(*) FROM bat) AS BIGINT),
         |  (SELECT count(*) FROM bat WHERE n_rows <> 1000) <= 1
         |UNION ALL
         |SELECT 'zorder_scan_gain',
         |  CAST((SELECT max(CASE WHEN layout = 'linear' THEN rows_scanned END)
         |        - max(CASE WHEN layout = 'zorder' THEN rows_scanned END)
         |        FROM zz) AS BIGINT),
         |  (SELECT max(CASE WHEN layout = 'linear' THEN rows_scanned END)
         |   FROM zz) >=
         |  (SELECT max(CASE WHEN layout = 'zorder' THEN rows_scanned END)
         |   FROM zz)""".stripMargin))(
      (s, d) => {
        val con = AggregateQueries.constraintsReport(s, d)
          .agg(sum(col("violations")).as("total_v"),
            sum(when(!col("passed"), 1L).otherwise(0L)).as("n_red"))
          .select(lit("constraints_green").as("check_name"),
            col("total_v").cast("bigint").as("metric"),
            (col("n_red") === 0).as("passed"))
        val bat = exportBatches(
            Tables(s, d, "orders").select(col("o_orderkey").as("key")))
          .agg(count(lit(1)).as("n_batches"),
            sum(when(col("n_rows") =!= 1000, 1L).otherwise(0L)).as("odd"))
          .select(lit("export_plan_sized").as("check_name"),
            col("n_batches").cast("bigint").as("metric"),
            (col("odd") <= 1).as("passed"))
        val z = graft.Catalog.byName("q_layout_zorder").fn(s, d)
          .agg(
            max(when(col("layout") === "linear", col("rows_scanned")))
              .as("lin"),
            max(when(col("layout") === "zorder", col("rows_scanned")))
              .as("zor"))
          .select(lit("zorder_scan_gain").as("check_name"),
            (col("lin") - col("zor")).cast("bigint").as("metric"),
            (col("lin") >= col("zor")).as("passed"))
        con.unionByName(bat).unionByName(z)
      }),

    // ---- CDC changelog apply: materialize the current snapshot from
    // a base load plus an ordered change stream (I/U/D records with a
    // per-key sequence) — the incremental half of the migrator's job
    // once the bulk copy lands. Last-writer-wins per key is a
    // primitive max(seq) hash aggregate plus a key-co-partitioned
    // shuffled-hash join back to the log (no rank window, no sort
    // aggregate — both would sort every key group), then deletes drop
    // out. The fixture's
    // changelog is modeled from orders in a single scan (conditional
    // per-row record arrays + one explode — the SCD2-merge discipline,
    // never one scan per op type): updates at keys ≡0 (mod 5) and a
    // second update wave at ≡0 (mod 35), deletes at ≡0 (mod 11); a
    // real changelog table plugs in with the identical apply plan.
    // Money stays in exact integer cents (updates are +cents deltas,
    // not FP multiplies). ----
    QueryDef("q_migrate_cdc_apply", Some(
      """WITH log AS (
        |  SELECT o_orderkey AS k, 0 AS seq, 'I' AS op,
        |    o_orderstatus AS status,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 1, 'U', 'U1',
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) + 500
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 2, 'D', NULL, NULL
        |  FROM orders WHERE o_orderkey % 11 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 3, 'U', 'U2',
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) + 1000
        |  FROM orders WHERE o_orderkey % 35 = 0),
        |last AS (
        |  SELECT k, seq, op, status, cents,
        |    row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
        |  FROM log)
        |SELECT k AS o_orderkey, op AS last_op, status, cents,
        |  CAST(seq AS BIGINT) AS version
        |FROM last WHERE rn = 1 AND op <> 'D'""".stripMargin))(
      (s, d) => {
        // last-writer-wins: max(seq) is a pure-primitive HashAggregate
        // (max_by over the record struct would fall back to
        // SortAggregate), then join back on the key — both sides hash-
        // partitioned on k, and the shuffle_hash hint keeps the probe
        // sort-free, so the whole apply is shuffles + hash ops only
        val log = cdcLog(s, d)
        val latest = log.groupBy(col("k")).agg(max(col("seq")).as("mseq"))
          .withColumnRenamed("k", "lk")
        log.join(latest.hint("shuffle_hash"),
            col("k") === col("lk") && col("seq") === col("mseq"))
          .where(col("op") =!= "D")
          .select(col("k").as("o_orderkey"), col("op").as("last_op"),
            col("status"), col("cents"),
            col("seq").cast("bigint").as("version"))
      }),

    // ---- SCD2 history from the same changelog: where cdc_apply
    // keeps only the LATEST state, this builds the full versioned
    // dimension — every non-delete record opens a version valid
    // [its seq, next record's seq); the key's last record leaves an
    // open (current) version; a delete closes the prior version
    // without opening one, and a later re-insert/update reopens
    // history (the k%385 keys exercise exactly that: I,U1,D,U2).
    // The only window partitions BY KEY over ≤4 records per key —
    // per-key bounded state, hash-partitioned, no global sort, the
    // same scale contract as the streaming sessionizers. ----
    QueryDef("q_migrate_cdc_history", Some(
      """WITH log AS (
        |  SELECT o_orderkey AS k, 0 AS seq, 'I' AS op,
        |    o_orderstatus AS status,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 1, 'U', 'U1',
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) + 500
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 2, 'D', NULL, NULL
        |  FROM orders WHERE o_orderkey % 11 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 3, 'U', 'U2',
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) + 1000
        |  FROM orders WHERE o_orderkey % 35 = 0),
        |v AS (
        |  SELECT k, seq, op, status, cents,
        |    lead(seq) OVER (PARTITION BY k ORDER BY seq) AS next_seq
        |  FROM log)
        |SELECT k AS o_orderkey, status, cents,
        |  CAST(seq AS BIGINT) AS valid_from_version,
        |  CAST(next_seq AS BIGINT) AS valid_to_version,
        |  (next_seq IS NULL) AS is_current
        |FROM v WHERE op <> 'D'""".stripMargin))(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("k")).orderBy(col("seq"))
        cdcLog(s, d)
          .withColumn("next_seq", lead(col("seq"), 1).over(w))
          .where(col("op") =!= "D")
          .select(col("k").as("o_orderkey"), col("status"), col("cents"),
            col("seq").cast("bigint").as("valid_from_version"),
            col("next_seq").cast("bigint").as("valid_to_version"),
            col("next_seq").isNull.as("is_current"))
      }),

    // ---- inclusion-dependency profiling: for each candidate
    // child→parent column pair, what fraction of the child's DISTINCT
    // values exist in the parent — the FK-discovery pre-flight a
    // migrator runs on an undocumented schema before trusting join
    // keys (coefficient 1.0 = containment holds; the deliberate
    // negative pair shows a non-key). Each pair is distinct-child (one
    // hash agg) + LEFT SEMI join against the parent keys — never a
    // row-level join of the full tables — so cost scales with distinct
    // key counts. The single FP division is exact-integer ÷
    // exact-integer, correctly rounded in both engines. ----
    QueryDef("q_profile_inclusion", Some {
      def pairSql(pair: String, child: String, ckey: String,
          parent: String, pkey: String) =
        s"""SELECT '$pair' AS pair,
           |  (SELECT count(*) FROM (SELECT DISTINCT $ckey FROM $child))
           |    AS n_child,
           |  (SELECT count(*) FROM (SELECT DISTINCT $ckey FROM $child) c
           |     WHERE EXISTS (SELECT 1 FROM $parent p
           |                   WHERE p.$pkey = c.$ckey)) AS n_matched""".stripMargin
      s"""WITH pairs AS (
         |${pairSql("lineitem.l_orderkey->orders.o_orderkey",
            "lineitem", "l_orderkey", "orders", "o_orderkey")}
         |UNION ALL
         |${pairSql("lineitem.l_partkey->part.p_partkey",
            "lineitem", "l_partkey", "part", "p_partkey")}
         |UNION ALL
         |${pairSql("orders.o_custkey->customer.c_custkey",
            "orders", "o_custkey", "customer", "c_custkey")}
         |UNION ALL
         |${pairSql("orders.o_custkey->part.p_partkey",
            "orders", "o_custkey", "part", "p_partkey")})
         |SELECT pair, n_child, n_matched,
         |  CAST(n_matched AS DOUBLE) / n_child AS coefficient
         |FROM pairs""".stripMargin
    })(
      (s, d) => {
        def pair(name: String, child: String, ckey: String,
            parent: String, pkey: String) = {
          val ck = Tables(s, d, child).select(col(ckey)).distinct()
          val matched = ck.join(Tables(s, d, parent),
              col(ckey) === col(pkey), "left_semi")
            .agg(count(lit(1)).as("n_matched"))
          ck.agg(count(lit(1)).as("n_child"))
            .crossJoin(matched)
            .select(lit(name).as("pair"), col("n_child"), col("n_matched"),
              (col("n_matched").cast("double") / col("n_child"))
                .as("coefficient"))
        }
        pair("lineitem.l_orderkey->orders.o_orderkey",
            "lineitem", "l_orderkey", "orders", "o_orderkey")
          .unionAll(pair("lineitem.l_partkey->part.p_partkey",
            "lineitem", "l_partkey", "part", "p_partkey"))
          .unionAll(pair("orders.o_custkey->customer.c_custkey",
            "orders", "o_custkey", "customer", "c_custkey"))
          .unionAll(pair("orders.o_custkey->part.p_partkey",
            "orders", "o_custkey", "part", "p_partkey"))
      }),

    // ---- functional-dependency discovery: for each candidate A→B,
    // the FD holds iff grouping by A never sees two B values —
    // count(DISTINCT A) = count(DISTINCT (A,B)) — and the violation
    // count (pairs distinct minus lhs distinct) says HOW broken a
    // failing candidate is, the signal schema inference ranks on.
    // Candidates mix true FDs (nation→region, the o_orderkey→custkey
    // key dependency) with a deliberate non-FD (mktsegment→nation).
    // Each check is one distinct-aggregate pass over the two columns
    // only (pruned scan); candidates union into one report. ----
    QueryDef("q_profile_fd", Some {
      def fdSql(name: String, table: String, a: String, b: String) =
        s"""SELECT '$name' AS candidate,
           |  (SELECT CAST(count(*) AS BIGINT) FROM
           |    (SELECT DISTINCT $a FROM $table)) AS lhs_distinct,
           |  (SELECT CAST(count(*) AS BIGINT) FROM
           |    (SELECT DISTINCT $a, $b FROM $table)) AS pair_distinct""".stripMargin
      s"""WITH cands AS (
         |${fdSql("nation.n_nationkey->n_regionkey", "nation",
            "n_nationkey", "n_regionkey")}
         |UNION ALL
         |${fdSql("orders.o_orderkey->o_custkey", "orders",
            "o_orderkey", "o_custkey")}
         |UNION ALL
         |${fdSql("customer.c_nationkey->c_mktsegment", "customer",
            "c_nationkey", "c_mktsegment")}
         |UNION ALL
         |${fdSql("lineitem.l_partkey->l_suppkey", "lineitem",
            "l_partkey", "l_suppkey")})
         |SELECT candidate, lhs_distinct, pair_distinct,
         |  CAST(pair_distinct - lhs_distinct AS BIGINT) AS violations,
         |  pair_distinct = lhs_distinct AS holds
         |FROM cands""".stripMargin
    })(
      (s, d) => {
        def fd(name: String, table: String, a: String, b: String) = {
          val t = Tables(s, d, table)
          t.select(col(a)).distinct().agg(count(lit(1)).as("lhs_distinct"))
            .crossJoin(t.select(col(a), col(b)).distinct()
              .agg(count(lit(1)).as("pair_distinct")))
            .select(lit(name).as("candidate"),
              col("lhs_distinct").cast("bigint").as("lhs_distinct"),
              col("pair_distinct").cast("bigint").as("pair_distinct"))
        }
        Seq(
          fd("nation.n_nationkey->n_regionkey", "nation",
            "n_nationkey", "n_regionkey"),
          fd("orders.o_orderkey->o_custkey", "orders",
            "o_orderkey", "o_custkey"),
          fd("customer.c_nationkey->c_mktsegment", "customer",
            "c_nationkey", "c_mktsegment"),
          fd("lineitem.l_partkey->l_suppkey", "lineitem",
            "l_partkey", "l_suppkey"))
          .reduce(_ unionAll _)
          .select(col("candidate"), col("lhs_distinct"),
            col("pair_distinct"),
            (col("pair_distinct") - col("lhs_distinct")).cast("bigint")
              .as("violations"),
            (col("pair_distinct") === col("lhs_distinct")).as("holds"))
      }),

    // ---- probabilistic record linkage (Fellegi–Sunter shape):
    // candidate pairs from BLOCKING (equi-join on nationkey — never
    // all-pairs; at 100 TB swap in a second blocking pass on another
    // key and union candidates), then a per-pair AGREEMENT VECTOR over
    // three comparators (balance within $100; key fragments mod 97 and
    // mod 10 — stand-ins for id-fragment comparators on real entity
    // data) and a LINKAGE SCORE as the sum of fixed integer log-odds
    // weights per agreement/disagreement (weights are trained
    // constants in a real deployment; integers here, so the score is
    // exact in both engines — no log() at query time, same reason the
    // BM25 entry is log-free). Pairs at or above the match threshold
    // survive. The oracle restates the same spec relationally; the
    // Spark side is one broadcast-free equi-join on the block key +
    // codegen'd comparators. ----
    QueryDef("q_link_fellegi", Some(
      """SELECT c.c_custkey AS custkey, s.s_suppkey AS suppkey,
        |  CAST(c.c_nationkey AS BIGINT) AS block,
        |  CAST(CASE WHEN abs(CAST(floor(c.c_acctbal*100 + 0.5) AS BIGINT)
        |    - CAST(floor(s.s_acctbal*100 + 0.5) AS BIGINT)) <= 10000
        |    THEN 1 ELSE 0 END AS BIGINT) AS a_bal,
        |  CAST(CASE WHEN c.c_custkey % 97 = s.s_suppkey % 97
        |    THEN 1 ELSE 0 END AS BIGINT) AS a_f97,
        |  CAST(CASE WHEN c.c_custkey % 10 = s.s_suppkey % 10
        |    THEN 1 ELSE 0 END AS BIGINT) AS a_f10,
        |  CAST((CASE WHEN abs(CAST(floor(c.c_acctbal*100 + 0.5) AS BIGINT)
        |          - CAST(floor(s.s_acctbal*100 + 0.5) AS BIGINT)) <= 10000
        |          THEN 18 ELSE -3 END)
        |    + (CASE WHEN c.c_custkey % 97 = s.s_suppkey % 97
        |          THEN 66 ELSE -1 END)
        |    + (CASE WHEN c.c_custkey % 10 = s.s_suppkey % 10
        |          THEN 33 ELSE -5 END) AS BIGINT) AS score
        |FROM customer c JOIN supplier s
        |  ON c.c_nationkey = s.s_nationkey
        |WHERE (CASE WHEN abs(CAST(floor(c.c_acctbal*100 + 0.5) AS BIGINT)
        |          - CAST(floor(s.s_acctbal*100 + 0.5) AS BIGINT)) <= 10000
        |          THEN 18 ELSE -3 END)
        |    + (CASE WHEN c.c_custkey % 97 = s.s_suppkey % 97
        |          THEN 66 ELSE -1 END)
        |    + (CASE WHEN c.c_custkey % 10 = s.s_suppkey % 10
        |          THEN 33 ELSE -5 END) >= 80""".stripMargin))(
      (s, d) => {
        val c = Tables(s, d, "customer").select(
          col("c_custkey").as("custkey"),
          col("c_nationkey").cast("bigint").as("block"),
          floor(col("c_acctbal") * 100 + 0.5).cast("bigint").as("c_cents"))
        val sup = Tables(s, d, "supplier").select(
          col("s_suppkey").as("suppkey"),
          col("s_nationkey").cast("bigint").as("s_block"),
          floor(col("s_acctbal") * 100 + 0.5).cast("bigint").as("s_cents"))
        c.join(sup, col("block") === col("s_block"))
          .withColumn("a_bal",
            (abs(col("c_cents") - col("s_cents")) <= 10000)
              .cast("bigint"))
          .withColumn("a_f97",
            (col("custkey") % 97 === col("suppkey") % 97).cast("bigint"))
          .withColumn("a_f10",
            (col("custkey") % 10 === col("suppkey") % 10).cast("bigint"))
          .withColumn("score",
            (when(col("a_bal") === 1, 18L).otherwise(-3L)
              + when(col("a_f97") === 1, 66L).otherwise(-1L)
              + when(col("a_f10") === 1, 33L).otherwise(-5L))
              .cast("bigint"))
          .where(col("score") >= 80)
          .select(col("custkey"), col("suppkey"), col("block"),
            col("a_bal"), col("a_f97"), col("a_f10"), col("score"))
      }),

    // ---- blocking-quality audit (record linkage): before running a
    // pairwise matcher (q_link_fellegi), a blocking scheme must be
    // judged on the two standard metrics — REDUCTION RATIO (fraction
    // of the N² pair space the blocks discard) and PAIRS COMPLETENESS
    // (fraction of TRUE matching pairs that co-block, ground truth =
    // the LSH near-dup clusters, composed from q_dedup_clusters on
    // both sides). Every count is a per-group c·(c−1)/2 over
    // histogram rows — candidate pairs are NEVER materialized, so the
    // audit costs three hash-aggs over doc-count-sized frames no
    // matter how bad the blocking is. Blocking key = (lang,
    // n_chars DIV 100): near-dups can straddle length buckets, so PC
    // is a real measurement, not 1.0 by construction. ----
    QueryDef("q_link_blocking_quality", Some(
      s"""WITH RECURSIVE ${DedupQueries.clustersPairsCte},
         |cl AS (${DedupQueries.clustersSelect}),
         |d2 AS (SELECT d.doc_id, cl.cluster_id, d.lang,
         |         d.n_chars // 100 AS lb
         |       FROM documents d JOIN cl ON cl.doc_id = d.doc_id),
         |tp AS (SELECT CAST(sum(CAST(m AS HUGEINT) * (m - 1) // 2)
         |         AS BIGINT) AS n_true
         |       FROM (SELECT cluster_id, count(*) AS m FROM d2
         |             GROUP BY 1) t),
         |cp AS (SELECT CAST(sum(CAST(c AS HUGEINT) * (c - 1) // 2)
         |         AS BIGINT) AS n_cand
         |       FROM (SELECT lang, lb, count(*) AS c FROM d2
         |             GROUP BY 1, 2) b),
         |cv AS (SELECT CAST(sum(CAST(c AS HUGEINT) * (c - 1) // 2)
         |         AS BIGINT) AS n_cov
         |       FROM (SELECT cluster_id, lang, lb, count(*) AS c FROM d2
         |             GROUP BY 1, 2, 3) x),
         |n AS (SELECT count(*) AS nd FROM d2)
         |SELECT n.nd AS n_docs, tp.n_true AS n_true_pairs,
         |  cp.n_cand AS n_cand_pairs, cv.n_cov AS n_covered_pairs,
         |  CAST((CAST(1000000 AS HUGEINT)
         |      * (CAST(n.nd AS HUGEINT) * (n.nd - 1) - 2 * cp.n_cand))
         |    // (CAST(n.nd AS HUGEINT) * (n.nd - 1)) AS BIGINT) AS rr_ppm,
         |  CAST(CASE WHEN tp.n_true = 0 THEN 1000000
         |       ELSE (1000000 * cv.n_cov) // tp.n_true END AS BIGINT)
         |    AS pc_ppm
         |FROM n, tp, cp, cv""".stripMargin))(
      (s, d) => {
        val cl = QueryDef.requireDef(DedupQueries.defs, "q_dedup_clusters",
          "q_link_blocking_quality").fn(s, d)
        val d2 = cl
          .join(Tables(s, d, "documents").select(col("doc_id"),
            col("lang"), expr("n_chars DIV 100").as("lb")), "doc_id")
          .persist() // four aggregates read it; upstream CC loop is dear
        // pair-space products widened to DECIMAL(38,0)/HUGEINT: c·(c−1)
        // passes the int64 line once one block holds ~3e9 docs, and
        // nd·(nd−1) at ~3e9 docs total — both reachable at 100 TB
        def pairsOf(g: org.apache.spark.sql.DataFrame, out: String) =
          g.agg(coalesce(
            sum(expr("CAST(c AS DECIMAL(38,0)) * (c - 1) DIV 2")), lit(0L))
            .cast("bigint").as(out))
        val tp = pairsOf(d2.groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("c")), "n_true")
        val cp = pairsOf(d2.groupBy(col("lang"), col("lb"))
          .agg(count(lit(1)).as("c")), "n_cand")
        val cv = pairsOf(d2.groupBy(col("cluster_id"), col("lang"),
          col("lb")).agg(count(lit(1)).as("c")), "n_cov")
        val n = d2.agg(count(lit(1)).as("nd"))
        n.crossJoin(broadcast(tp)).crossJoin(broadcast(cp))
          .crossJoin(broadcast(cv))
          .select(col("nd").as("n_docs"),
            col("n_true").as("n_true_pairs"),
            col("n_cand").as("n_cand_pairs"),
            col("n_cov").as("n_covered_pairs"),
            // 2× cleared denominators so the pair space never needs its
            // own DIV 2 (Spark decimal DIV narrows to int64)
            expr("CAST((CAST(1000000 AS DECIMAL(38,0))" +
              " * (CAST(nd AS DECIMAL(38,0)) * (nd - 1) - 2 * n_cand))" +
              " DIV (CAST(nd AS DECIMAL(38,0)) * (nd - 1)) AS BIGINT)")
              .as("rr_ppm"),
            expr("CAST(CASE WHEN n_true = 0 THEN 1000000" +
              " ELSE (1000000 * n_cov) DIV n_true END AS BIGINT)")
              .as("pc_ppm"))
      })
  )

  /** The modeled CDC changelog (flat: k, seq, op, status, cents) —
    * one scan, each base row emits its full per-key log slice via
    * conditional record arrays + one explode. Shared by the
    * q_migrate_cdc_apply entry and the streaming CDC test (the
    * stream replays exactly this log through `CdcStream.apply`). */
  private[graft] def cdcLog(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val base = Tables(s, d, "orders").select(
      col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
      floor(col("o_totalprice") * 100 + 0.5).cast("bigint").as("cents"))
    def rec(seq: Int, op: String, status: Column, cents: Column) =
      struct(lit(seq).as("seq"), lit(op).as("op"),
        status.cast("string").as("status"),
        cents.cast("bigint").as("cents"))
    val emptyRec =
      array().cast("array<struct<seq:int,op:string,status:string,cents:bigint>>")
    base.select(col("k"), explode(concat(
        array(rec(0, "I", col("status"), col("cents"))),
        when(pmod(col("k"), lit(5L)) === 0,
          array(rec(1, "U", lit("U1"), col("cents") + 500)))
          .otherwise(emptyRec),
        when(pmod(col("k"), lit(11L)) === 0,
          array(rec(2, "D", lit(null), lit(null))))
          .otherwise(emptyRec),
        when(pmod(col("k"), lit(35L)) === 0,
          array(rec(3, "U", lit("U2"), col("cents") + 1000)))
          .otherwise(emptyRec))).as("r"))
      .select(col("k"), col("r.seq").as("seq"), col("r.op").as("op"),
        col("r.status").as("status"), col("r.cents").as("cents"))
  }

  /** The export-batching DuckDB twin — also reused by the readiness
    * e2e. */
  private[queries] lazy val exportBatchesSql: String =
    """WITH k AS (
      |  SELECT o_orderkey AS key,
      |    CAST(floor(o_orderkey / 65536.0) AS BIGINT) AS shard
      |  FROM orders),
      |l AS (SELECT key, shard,
      |        row_number() OVER (PARTITION BY shard ORDER BY key) AS rn
      |      FROM k),
      |o AS (SELECT shard, count(*) AS c FROM k GROUP BY shard),
      |ofs AS (SELECT shard,
      |          CAST(coalesce(sum(c) OVER (ORDER BY shard
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |          AS BIGINT) AS off
      |        FROM o),
      |b AS (SELECT key,
      |        CAST(floor((l.rn + ofs.off - 1) / 1000.0) AS BIGINT)
      |          AS batch_id
      |      FROM l JOIN ofs ON l.shard = ofs.shard)
      |SELECT batch_id, count(*) AS n_rows,
      |  CAST(min(key) AS BIGINT) AS cursor_lo,
      |  CAST(max(key) AS BIGINT) AS cursor_hi
      |FROM b GROUP BY batch_id""".stripMargin

  /** Keyset batching shared by the catalog entry and ExportBatchSpec
    * (which pins the resume contract): exactly-1000-row batches in
    * `key` order via per-shard row_number + broadcast shard offsets. */
  private[graft] def exportBatches(keys: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = keys.select(col("key"),
      expr("CAST(floor(key / 65536.0) AS BIGINT)").as("shard"))
    val l = k.withColumn("rn", row_number().over(
      Window.partitionBy(col("shard")).orderBy(col("key"))))
    val ofs = k.groupBy(col("shard")).agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(
        sum(col("c")).over(graft.ops.BoundedWindow.ordered(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("shard"), col("off"))
    l.join(broadcast(ofs), "shard")
      .select(col("key"),
        expr("CAST(floor((rn + off - 1) / 1000.0) AS BIGINT)").as("batch_id"))
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("key")).cast("bigint").as("cursor_lo"),
        max(col("key")).cast("bigint").as("cursor_hi"))
  }
}
