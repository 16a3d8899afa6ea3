package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.3/§2.4): string, date/time,
  * math, conditional (CASE), JSON. The reference exposes this entire
  * surface via config `selectExpr`/`where` strings parsed by Spark's SQL
  * parser; here each family is exercised explicitly with a DuckDB twin.
  *
  * Cross-engine notes baked in:
  *  - day-of-week: Spark `weekday()` is 0=Mon; DuckDB `isodow` is 1=Mon.
  *  - no `round`/transcendentals on data doubles (libm divergence);
  *    `sqrt` is IEEE-754 correctly rounded so it is safe.
  *  - JSON: Spark `get_json_object` <-> DuckDB `json_extract_string`.
  */
object ScalarQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_fn_string", Some(
      """SELECT c_custkey AS custkey,
        |  upper(c_name) AS uname,
        |  substr(c_name, 1, 9) AS prefix,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  concat_ws('|', c_mktsegment, c_name) AS tag,
        |  replace(lower(c_name), 'customer', 'cust') AS shortname,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_id,
        |  trim('  x  ') AS trimmed
        |FROM customer""".stripMargin))(
      (s, d) =>
        Tables(s, d, "customer").select(
          col("c_custkey").as("custkey"),
          upper(col("c_name")).as("uname"),
          substring(col("c_name"), 1, 9).as("prefix"),
          length(col("c_name")).cast("bigint").as("name_len"),
          concat_ws("|", col("c_mktsegment"), col("c_name")).as("tag"),
          regexp_replace(lower(col("c_name")), "customer", "cust").as("shortname"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded_id"),
          trim(lit("  x  ")).as("trimmed"))),

    QueryDef("q_fn_date", Some(
      """SELECT o_orderkey AS orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  CAST(isodow(o_orderdate) AS INT) AS iso_dow,
        |  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch0,
        |  CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS plus30
        |FROM orders""".stripMargin))(
      (s, d) =>
        Tables(s, d, "orders").select(
          col("o_orderkey").as("orderkey"),
          year(col("o_orderdate")).cast("bigint").as("y"),
          month(col("o_orderdate")).cast("bigint").as("m"),
          dayofmonth(col("o_orderdate")).cast("bigint").as("dom"),
          quarter(col("o_orderdate")).cast("bigint").as("q"),
          (weekday(col("o_orderdate")) + 1).as("iso_dow"),
          date_trunc("month", col("o_orderdate")).cast("date").cast("string")
            .as("month_start"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
            .cast("long").as("days_since_epoch0"),
          date_add(col("o_orderdate").cast("date"), 30).cast("string").as("plus30"))),

    QueryDef("q_fn_math", Some(
      """SELECT c_custkey AS custkey,
        |  abs(c_acctbal) AS abs_bal,
        |  CAST(ceil(c_acctbal) AS DOUBLE) AS ceil_bal,
        |  CAST(floor(c_acctbal) AS DOUBLE) AS floor_bal,
        |  CAST(sign(c_acctbal) AS DOUBLE) AS sign_bal,
        |  sqrt(abs(c_acctbal)) AS sqrt_bal,
        |  c_acctbal * c_acctbal AS sq_bal,
        |  CAST(c_custkey % 7 AS BIGINT) AS mod7,
        |  greatest(c_acctbal, 0.0) AS pos_bal,
        |  least(c_acctbal, 1000.0) AS capped_bal
        |FROM customer""".stripMargin))(
      (s, d) =>
        Tables(s, d, "customer").select(
          col("c_custkey").as("custkey"),
          abs(col("c_acctbal")).as("abs_bal"),
          ceil(col("c_acctbal")).cast("double").as("ceil_bal"),
          floor(col("c_acctbal")).cast("double").as("floor_bal"),
          signum(col("c_acctbal")).cast("double").as("sign_bal"),
          sqrt(abs(col("c_acctbal"))).as("sqrt_bal"),
          (col("c_acctbal") * col("c_acctbal")).as("sq_bal"),
          (col("c_custkey") % 7).cast("long").as("mod7"),
          greatest(col("c_acctbal"), lit(0.0)).as("pos_bal"),
          least(col("c_acctbal"), lit(1000.0)).as("capped_bal"))),

    // CASE WHEN tiering + conditional aggregation.
    QueryDef("q_fn_case", Some(
      """SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
        |            WHEN c_acctbal < 3000 THEN 'low'
        |            WHEN c_acctbal < 7000 THEN 'mid'
        |            ELSE 'high' END AS tier,
        |  count(*) AS n,
        |  count(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS n_building
        |FROM customer GROUP BY 1""".stripMargin))(
      (s, d) =>
        Tables(s, d, "customer")
          .groupBy(
            when(col("c_acctbal") < 0, "debt")
              .when(col("c_acctbal") < 3000, "low")
              .when(col("c_acctbal") < 7000, "mid")
              .otherwise("high").as("tier"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("c_mktsegment") === "BUILDING", 1).otherwise(0))
              .as("n_building"))),

    // JSON extraction from the events.props payload.
    QueryDef("q_fn_json", Some(
      """SELECT event_id AS eid,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin))(
      (s, d) =>
        Tables(s, d, "events").select(
          col("event_id").as("eid"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))),

    // Spark 4 VARIANT: parse once into the binary semi-structured
    // type, then typed path extraction — the open-schema lane for
    // payloads whose shape is not known at write time (vs from_json's
    // fixed StructType). At scale the parse happens once per row and
    // every downstream access is a cheap typed probe; the oracle is
    // DuckDB's JSON path extraction over the same payloads.
    QueryDef("q_fn_variant", Some(
      """SELECT event_id AS eid,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  json_extract_string(props, '$.missing') AS missing
        |FROM events""".stripMargin))(
      (s, d) =>
        Tables(s, d, "events")
          .select(col("event_id").as("eid"), parse_json(col("props")).as("v"))
          .select(col("eid"),
            expr("variant_get(v, '$.k', 'long')").as("k"),
            expr("variant_get(v, '$.missing', 'string')").as("missing"))),

    // array functions over the token array (two-step select: see
    // TextOps on HOF inlining).
    QueryDef("q_fn_array", Some(
      """SELECT doc_id,
        |  len(w) AS n_tokens,
        |  list_contains(w, 'data') AS has_data,
        |  w[1] AS first_token,
        |  array_to_string(list_sort(list_distinct(w))[1:3], ' ') AS first3_sorted,
        |  CAST(coalesce(list_position(w, 'data'), 0) AS BIGINT) AS pos_data,
        |  list_aggregate(w, 'max') AS max_token
        |FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)""".stripMargin))(
      (s, d) =>
        Tables(s, d, "documents")
          .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
          .select(
            col("doc_id"),
            size(col("w")).cast("bigint").as("n_tokens"),
            array_contains(col("w"), "data").as("has_data"),
            element_at(col("w"), 1).as("first_token"),
            array_join(slice(array_sort(array_distinct(col("w"))), 1, 3), " ")
              .as("first3_sorted"),
            array_position(col("w"), "data").as("pos_data"),
            array_max(col("w")).as("max_token"))),

    // map construction/access (map value equality is engine-specific in
    // the driver compare, so the map itself is exploded to scalars).
    QueryDef("q_fn_map", Some(
      """SELECT doc_id,
        |  map_extract(MAP(['lang','source'], [lang, source]), 'lang')[1] AS m_lang,
        |  array_to_string(list_sort(map_keys(MAP(['lang','source'], [lang, source]))), ' ') AS keys_sorted,
        |  CAST(cardinality(MAP(['lang','source'], [lang, source])) AS BIGINT) AS m_size
        |FROM documents""".stripMargin))(
      (s, d) =>
        Tables(s, d, "documents")
          .select(col("doc_id"),
            map(lit("lang"), col("lang"), lit("source"), col("source")).as("m"))
          .select(
            col("doc_id"),
            element_at(col("m"), "lang").as("m_lang"),
            array_join(array_sort(map_keys(col("m"))), " ").as("keys_sorted"),
            size(col("m")).cast("bigint").as("m_size"))),

    // null handling: coalesce / nullif / CASE over an outer-join null.
    QueryDef("q_fn_nulls", Some(
      """SELECT c_custkey AS custkey,
        |  coalesce(o.n, 0) AS n_orders,
        |  CASE WHEN o.n IS NULL THEN 'inactive' ELSE 'active' END AS activity,
        |  nullif(c_mktsegment, 'BUILDING') AS seg_or_null
        |FROM customer LEFT JOIN
        |  (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey) o
        |ON c_custkey = o.o_custkey""".stripMargin))(
      (s, d) => {
        val c = Tables(s, d, "customer")
        val o = Tables(s, d, "orders").groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .select(
            c("c_custkey").as("custkey"),
            coalesce(o("n"), lit(0)).as("n_orders"),
            when(o("n").isNull, "inactive").otherwise("active").as("activity"),
            nullif(c("c_mktsegment"), lit("BUILDING")).as("seg_or_null"))
      }),

    // ---- bitwise surface: and/or/xor/shift/popcount — the hash/
    // partition/bitmap arithmetic the engine leans on elsewhere,
    // exercised as user-facing scalars. Pure integer ops, exact. ----
    QueryDef("q_fn_bitwise", Some(
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS low_byte,
        |  o_orderkey | 4096 AS with_flag,
        |  xor(o_orderkey, o_custkey) AS key_xor,
        |  o_orderkey << 2 AS shl2,
        |  o_orderkey >> 3 AS shr3,
        |  CAST(bit_count(o_orderkey) AS INT) AS popcount
        |FROM orders""".stripMargin))(
      (s, d) =>
        Tables(s, d, "orders").select(
          col("o_orderkey"),
          col("o_orderkey").bitwiseAND(lit(255L)).as("low_byte"),
          col("o_orderkey").bitwiseOR(lit(4096L)).as("with_flag"),
          col("o_orderkey").bitwiseXOR(col("o_custkey")).as("key_xor"),
          shiftleft(col("o_orderkey"), 2).as("shl2"),
          shiftright(col("o_orderkey"), 3).as("shr3"),
          bit_count(col("o_orderkey")).as("popcount"))),

    // ---- boolean aggregate surface: count_if / bool_and / bool_or —
    // the predicate-summary trio behind data-quality gates. Shared
    // text in both dialects (Spark and DuckDB agree on all three
    // names); count_if is CAST to BIGINT because DuckDB's returns
    // HUGEINT. Exact by construction: integer counts and three-valued
    // boolean logic over non-NULL inputs. ----
    QueryDef("q_fn_bool", Some(
      """SELECT o_orderstatus AS status,
        |  CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big,
        |  bool_and(o_totalprice > 1000) AS all_over_1k,
        |  bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
        |  CAST(count_if(o_custkey % 2 = 0) AS BIGINT) AS n_even,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin))(
      (s, d) =>
        Tables(s, d, "orders")
          .groupBy(col("o_orderstatus").as("status"))
          .agg(
            expr("CAST(count_if(o_totalprice > 150000) AS BIGINT)").as("n_big"),
            expr("bool_and(o_totalprice > 1000)").as("all_over_1k"),
            expr("bool_or(o_orderpriority = '1-URGENT')").as("any_urgent"),
            expr("CAST(count_if(o_custkey % 2 = 0) AS BIGINT)").as("n_even"),
            count(lit(1)).as("n"))),

    // ---- ordered string aggregation: the LISTAGG/STRING_AGG surface.
    // Spark's collect_set is unordered (shuffle-order-dependent), so
    // the deterministic rendering is array_sort BEFORE the join —
    // semantically identical to DuckDB's
    // string_agg(DISTINCT .. ORDER BY ..). Distinct priorities per
    // group are ≤5, so the aggregated string is bounded state. ----
    QueryDef("q_fn_string_agg", Some(
      """SELECT o_orderstatus AS status,
        |  string_agg(DISTINCT o_orderpriority, ','
        |    ORDER BY o_orderpriority) AS prios,
        |  count(DISTINCT o_orderpriority) AS n_prios
        |FROM orders GROUP BY o_orderstatus""".stripMargin))(
      (s, d) =>
        Tables(s, d, "orders")
          .groupBy(col("o_orderstatus").as("status"))
          .agg(
            array_join(array_sort(collect_set(col("o_orderpriority"))), ",")
              .as("prios"),
            countDistinct(col("o_orderpriority")).as("n_prios")))
  )
}
