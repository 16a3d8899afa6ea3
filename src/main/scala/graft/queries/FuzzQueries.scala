package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Seeded-random differential battery (ROADMAP "oracle fuzzing"):
  * a deterministic generator emits filter→group→agg queries over
  * `lineitem` as REAL catalog entries, so the fuzz runs through the
  * same DuckDB gate as the hand-written surface — Spark executes the
  * query via the DataFrame API (`where`/`groupBy`/`agg`), DuckDB runs
  * the generated ANSI text, and the driver hash-compares. The grammar
  * sticks to constructs whose cross-engine semantics are proven
  * elsewhere in the catalog (integer remainder and comparisons on
  * BIGINT, BETWEEN on doubles, IN lists, AND/OR nesting, money sums
  * through DECIMAL(18,2), min/max, count distinct).
  *
  * Seeds are FIXED (query text is a pure function of the build), so a
  * failure reproduces exactly; widen by bumping `N` or reseeding.
  */
object FuzzQueries {

  private val seed = 20260812L
  private val N = 16

  private val longCols = Vector("l_orderkey", "l_partkey", "l_suppkey")
  private val keyPool = Vector("l_returnflag", "l_linestatus", "l_linenumber")
  private val cmpOps = Vector("<", "<=", "=", ">=", ">")

  private def pick[T](rnd: Random, xs: Vector[T]): T = xs(rnd.nextInt(xs.size))

  /** One predicate atom, valid verbatim in BOTH dialects. */
  private def atom(rnd: Random): String = rnd.nextInt(4) match {
    case 0 =>
      val c = pick(rnd, longCols)
      val m = pick(rnd, Vector(2, 3, 5, 7, 11))
      s"$c % $m = ${rnd.nextInt(m)}"
    case 1 =>
      val c = pick(rnd, longCols)
      val bound = c match {
        case "l_orderkey" => 1 + rnd.nextInt(60000)
        case "l_partkey"  => 1 + rnd.nextInt(20000)
        case _            => 1 + rnd.nextInt(1000)
      }
      s"$c ${pick(rnd, cmpOps)} $bound"
    case 2 =>
      val lo = 1 + rnd.nextInt(40)
      s"l_quantity BETWEEN $lo AND ${lo + 1 + rnd.nextInt(15)}"
    case 3 =>
      if (rnd.nextBoolean()) {
        val vs = Vector("A", "N", "R").filter(_ => rnd.nextBoolean()) match {
          case Vector() => Vector("A")
          case v => v
        }
        s"l_returnflag IN (${vs.map(v => s"'$v'").mkString(", ")})"
      } else s"l_linestatus = '${pick(rnd, Vector("F", "O"))}'"
  }

  private def predicate(rnd: Random): String = rnd.nextInt(4) match {
    case 0 => s"${atom(rnd)} AND ${atom(rnd)}"
    case 1 => s"(${atom(rnd)} OR ${atom(rnd)}) AND ${atom(rnd)}"
    case 2 => s"${atom(rnd)} AND (${atom(rnd)} OR ${atom(rnd)})"
    case 3 => s"${atom(rnd)} OR ${atom(rnd)}"
  }

  /** Aggregates, aliased identically on both sides. */
  private def aggs(rnd: Random): Seq[String] = {
    val pool = Vector(
      "count(1) AS n",
      s"CAST(sum(CAST(${pick(rnd, Vector("l_quantity", "l_extendedprice", "l_discount"))}" +
        " AS DECIMAL(18,2))) AS DOUBLE) AS money_sum",
      // CAST pins the width: DuckDB sum(BIGINT) is HUGEINT (→ pandas
      // float64), Spark's is BIGINT; the driver hashes via pandas where
      // width is part of identity. Same text runs in both dialects
      // (Spark-side cast is a no-op).
      s"CAST(sum(${pick(rnd, longCols)}) AS BIGINT) AS key_sum",
      s"min(${pick(rnd, Vector("l_quantity", "l_extendedprice", "l_orderkey"))}) AS mn",
      s"max(${pick(rnd, Vector("l_quantity", "l_extendedprice", "l_orderkey"))}) AS mx",
      s"count(DISTINCT ${pick(rnd, longCols)}) AS nd")
    // always count(1); then 2 more distinct-alias picks
    val extra = rnd.shuffle(pool.tail).take(2)
    (pool.head +: extra).distinct
  }

  private def gen(i: Int): QueryDef = {
    val rnd = new Random(seed * 1000 + i)
    val pred = predicate(rnd)
    val nKeys = 1 + rnd.nextInt(2)
    val keys = rnd.shuffle(keyPool).take(nKeys)
    val ags = aggs(rnd)
    val sql =
      s"""SELECT ${(keys ++ ags).mkString(", ")}
         |FROM lineitem
         |WHERE $pred
         |GROUP BY ${keys.mkString(", ")}""".stripMargin
    QueryDef(f"q_fuzz_$i%02d", Some(sql))(
      (s, d) =>
        Tables(s, d, "lineitem")
          .where(pred)
          .groupBy(keys.map(col): _*)
          .agg(expr(ags.head), ags.tail.map(expr): _*))
  }

  // ---- join family: lineitem ⋈ orders with predicates on both
  // sides, mixed group keys, and a HAVING filter — the fuzz grammar's
  // second tier (same proven-construct discipline). ----

  private val joinKeyPool =
    Vector("l_returnflag", "l_linestatus", "o_orderstatus", "o_orderpriority")

  private def ordersAtom(rnd: Random): String = rnd.nextInt(4) match {
    case 0 => s"o_orderstatus = '${pick(rnd, Vector("F", "O", "P"))}'"
    case 1 => s"o_orderpriority IN ('${pick(rnd,
      Vector("1-URGENT", "2-HIGH", "3-MEDIUM"))}', '${pick(rnd,
      Vector("4-NOT SPECIFIED", "5-LOW"))}')"
    case 2 => s"o_custkey ${pick(rnd, cmpOps)} ${1 + rnd.nextInt(1500)}"
    case 3 =>
      val lo = 1000 * (1 + rnd.nextInt(100))
      s"o_totalprice BETWEEN $lo AND ${lo + 1000 * (1 + rnd.nextInt(200))}"
  }

  private def genJoin(i: Int): QueryDef = {
    val rnd = new Random(seed * 7919 + i)
    val pred = s"${atom(rnd)} AND ${ordersAtom(rnd)}"
    val keys = rnd.shuffle(joinKeyPool).take(1 + rnd.nextInt(2))
    val ags = Vector(
      "count(1) AS n",
      s"CAST(sum(CAST(${pick(rnd, Vector("l_extendedprice", "o_totalprice"))}" +
        " AS DECIMAL(18,2))) AS DOUBLE) AS money_sum",
      s"count(DISTINCT ${pick(rnd, Vector("l_suppkey", "o_custkey"))}) AS nd")
    val minN = 1 + rnd.nextInt(20)
    val sql =
      s"""SELECT ${(keys ++ ags).mkString(", ")}
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE $pred
         |GROUP BY ${keys.mkString(", ")}
         |HAVING count(1) > $minN""".stripMargin
    QueryDef(f"q_fuzzj_$i%02d", Some(sql))(
      (s, d) =>
        Tables(s, d, "lineitem")
          .join(Tables(s, d, "orders"), expr("l_orderkey = o_orderkey"))
          .where(pred)
          .groupBy(keys.map(col): _*)
          .agg(expr(ags.head), ags.tail.map(expr): _*)
          .where(col("n") > minN))
  }

  // ---- window family: filter → window function → outer aggregate,
  // the fuzz grammar's third tier. The fixture's (l_orderkey,
  // l_linenumber) is NOT unique (≈7k tie groups at sf0.01), so
  // per-row window values are only cross-engine-deterministic when
  // they are tie-order INVARIANT; the grammar enforces that per
  // shape: running sums and lags lead their ORDER BY with the
  // measured column itself (tied rows then carry equal measures, so
  // any tie order yields the same value sequence); row_number sums
  // are permutation-invariant because the outer group IS the window
  // partition; dense_rank orders by value alone. FP discipline:
  // running sums stay in DECIMAL end-to-end and only small-magnitude
  // measures (l_quantity, l_discount) are window-summed, so the
  // final DECIMAL→DOUBLE cast is exact. ----

  private def genWindow(i: Int): QueryDef = {
    val rnd = new Random(seed * 104729 + i)
    val pred = predicate(rnd)
    val pkey = pick(rnd, keyPool)
    def over(lead: String*) = s"PARTITION BY $pkey ORDER BY " +
      (lead ++ Seq("l_orderkey", "l_linenumber")).mkString(", ")
    // (window expr, outer aggs over alias w) — identical in both dialects
    val (winExpr, outerAggs) = rnd.nextInt(4) match {
      case 0 =>
        // sum/max of row_number over the whole partition are invariant
        // under tie order (the values are a permutation of 1..n).
        // CAST pins widths: Spark's rank functions return INT where
        // DuckDB's return BIGINT, and DuckDB's sum(BIGINT) is HUGEINT —
        // the driver hashes pandas dtypes, so widths are identity.
        (s"CAST(row_number() OVER (${over()}) AS BIGINT)",
          Seq("CAST(sum(w) AS BIGINT) AS w_sum",
            "CAST(max(w) AS BIGINT) AS w_max"))
      case 1 =>
        val c = pick(rnd, Vector("l_quantity", "l_discount"))
        (s"sum(CAST($c AS DECIMAL(18,2))) OVER (${over(c)} " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
          Seq("CAST(sum(w) AS DOUBLE) AS w_sum",
            "CAST(max(w) AS DOUBLE) AS w_max"))
      case 2 =>
        (s"lag(l_quantity, ${1 + rnd.nextInt(3)}, 0.0) OVER (${over("l_quantity")})",
          Seq("CAST(sum(CAST(w AS DECIMAL(18,2))) AS DOUBLE) AS w_sum",
            "max(w) AS w_max"))
      case 3 =>
        val c = pick(rnd, Vector("l_quantity", "l_extendedprice"))
        (s"CAST(dense_rank() OVER (PARTITION BY $pkey ORDER BY $c) AS BIGINT)",
          Seq("CAST(sum(w) AS BIGINT) AS w_sum",
            "CAST(max(w) AS BIGINT) AS w_max"))
    }
    val sql =
      s"""WITH b AS (
         |  SELECT $pkey AS k, $winExpr AS w
         |  FROM lineitem
         |  WHERE $pred)
         |SELECT k, count(1) AS n, ${outerAggs.mkString(", ")}
         |FROM b GROUP BY k""".stripMargin
    QueryDef(f"q_fuzzw_$i%02d", Some(sql))(
      (s, d) =>
        Tables(s, d, "lineitem")
          .where(pred)
          .select(col(pkey).as("k"), expr(s"$winExpr AS w"))
          .groupBy(col("k"))
          .agg(expr("count(1) AS n"), outerAggs.map(expr): _*))
  }

  // ---- subquery family: EXISTS / NOT EXISTS / IN / correlated
  // scalar over orders↔lineitem — the fuzz grammar's fourth tier.
  // These shapes exercise Catalyst's decorrelation (semi/anti joins,
  // aggregate + outer join) from GENERATED text, so a planner
  // regression on any rewrite path fails the oracle gate, not just
  // the six hand-written subquery entries. Spark executes the SAME
  // ANSI string (subqueries have no DataFrame rendering), DuckDB the
  // identical text — both planned from one source. Correlated
  // scalars are coalesced to 0 before aggregation (empty-match NULL
  // handling pinned on both sides); all aggregates follow the
  // established parity rules (DECIMAL money, min/max, counts). ----

  private def genSub(i: Int): QueryDef = {
    val rnd = new Random(seed * 15485863L + i)
    val outerPred = ordersAtom(rnd)
    val innerAtom = atom(rnd)
    val key = pick(rnd, Vector("o_orderstatus", "o_orderpriority"))
    val shape = i % 4
    val sql = shape match {
      case 0 =>
        s"""SELECT $key AS k, count(1) AS n,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS money_sum
           |FROM orders o
           |WHERE $outerPred AND EXISTS (
           |  SELECT 1 FROM lineitem l
           |  WHERE l.l_orderkey = o.o_orderkey AND $innerAtom)
           |GROUP BY $key""".stripMargin
      case 1 =>
        s"""SELECT $key AS k, count(1) AS n, min(o_orderkey) AS mn,
           |  max(o_orderkey) AS mx
           |FROM orders o
           |WHERE $outerPred AND NOT EXISTS (
           |  SELECT 1 FROM lineitem l
           |  WHERE l.l_orderkey = o.o_orderkey AND $innerAtom)
           |GROUP BY $key""".stripMargin
      case 2 =>
        s"""SELECT $key AS k, count(1) AS n,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS money_sum
           |FROM orders o
           |WHERE $outerPred AND o_orderkey IN (
           |  SELECT l_orderkey FROM lineitem WHERE $innerAtom)
           |GROUP BY $key""".stripMargin
      case _ =>
        s"""SELECT $key AS k, count(1) AS n,
           |  max(coalesce((SELECT max(l.l_quantity) FROM lineitem l
           |    WHERE l.l_orderkey = o.o_orderkey AND $innerAtom), 0)) AS mx_sub,
           |  CAST(sum(CAST(coalesce((SELECT max(l.l_quantity) FROM lineitem l
           |    WHERE l.l_orderkey = o.o_orderkey AND $innerAtom), 0)
           |    AS DECIMAL(18,2))) AS DOUBLE) AS sum_sub
           |FROM orders o
           |WHERE $outerPred
           |GROUP BY $key""".stripMargin
    }
    QueryDef(f"q_fuzzs_$i%02d", Some(sql))(
      (s, d) => { Tables.registerAll(s, d); s.sql(sql) })
  }

  // ---- set-op family: two filtered projections of lineitem combined
  // by UNION / UNION ALL / INTERSECT / EXCEPT, then aggregated — the
  // fuzz grammar's fifth tier. Spark renders the DataFrame form
  // (union/distinct/intersect/except — bag vs set semantics chosen to
  // match the ANSI operator exactly), DuckDB the generated text. ----

  private def genSet(i: Int): QueryDef = {
    val rnd = new Random(seed * 32452843L + i)
    val predA = predicate(rnd)
    val predB = predicate(rnd)
    val c1 = pick(rnd, longCols)
    val c2 = pick(rnd, Vector("l_linenumber", "l_returnflag", "l_linestatus"))
    val op = i % 4
    val opSql = Vector("UNION", "UNION ALL", "INTERSECT", "EXCEPT")(op)
    val sql =
      s"""WITH u AS (
         |  (SELECT $c1, $c2 FROM lineitem WHERE $predA)
         |  $opSql
         |  (SELECT $c1, $c2 FROM lineitem WHERE $predB))
         |SELECT count(1) AS n, min($c1) AS mn, max($c1) AS mx,
         |  count(DISTINCT $c2) AS nd
         |FROM u""".stripMargin
    QueryDef(f"q_fuzzu_$i%02d", Some(sql))(
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        val a = li.where(predA).select(col(c1), col(c2))
        val b = li.where(predB).select(col(c1), col(c2))
        val u = op match {
          case 0 => a.union(b).distinct()
          case 1 => a.union(b)
          case 2 => a.intersect(b)
          case _ => a.except(b)
        }
        u.agg(count(lit(1)).as("n"), min(col(c1)).as("mn"),
          max(col(c1)).as("mx"), countDistinct(col(c2)).as("nd"))
      })
  }

  // ---- ORDER BY + LIMIT family: filter → group → agg → top-k — the
  // fuzz grammar's sixth tier. LIMIT is only cross-engine-deterministic
  // under a TOTAL order, so the ORDER BY leads with the count and
  // tie-breaks on the full group-key tuple (groups are unique, so the
  // order is total regardless of count ties). ----

  private def genTopk(i: Int): QueryDef = {
    val rnd = new Random(seed * 179424673L + i)
    val pred = predicate(rnd)
    val keys = rnd.shuffle(keyPool).take(1 + rnd.nextInt(2))
    val ags = aggs(rnd)
    val k = 3 + rnd.nextInt(5)
    val orderCols = "n DESC, " + keys.mkString(", ")
    val sql =
      s"""SELECT ${(keys ++ ags).mkString(", ")}
         |FROM lineitem
         |WHERE $pred
         |GROUP BY ${keys.mkString(", ")}
         |ORDER BY $orderCols
         |LIMIT $k""".stripMargin
    QueryDef(f"q_fuzzt_$i%02d", Some(sql))(
      (s, d) =>
        Tables(s, d, "lineitem")
          .where(pred)
          .groupBy(keys.map(col): _*)
          .agg(expr(ags.head), ags.tail.map(expr): _*)
          .orderBy(col("n").desc +: keys.map(c => col(c).asc): _*)
          .limit(k))
  }

  // ---- join + window composite family: lineitem ⋈ orders → filter →
  // window over the joined rows → outer aggregate — the seventh tier,
  // composing two rewrite paths (join planning and window exec) in one
  // generated query. Same tie-order-invariance discipline as the
  // window tier: row_number aggregates are permutation-invariant when
  // the outer group IS the window partition; dense_rank orders by
  // value alone; whole-partition DECIMAL sums are order-free. Widths
  // pinned via CAST (rank fns are INT in Spark / BIGINT in DuckDB;
  // DuckDB sum(BIGINT) is HUGEINT). ----

  private def genJoinWindow(i: Int): QueryDef = {
    val rnd = new Random(seed * 611953L + i)
    val pred = s"${atom(rnd)} AND ${ordersAtom(rnd)}"
    val pkey = pick(rnd, Vector("o_orderstatus", "o_orderpriority", "l_returnflag"))
    val (winExpr, outerAggs) = i % 3 match {
      case 0 =>
        (s"CAST(row_number() OVER (PARTITION BY $pkey " +
          "ORDER BY l_orderkey, l_linenumber, l_suppkey) AS BIGINT)",
          Seq("CAST(sum(w) AS BIGINT) AS w_sum",
            "CAST(max(w) AS BIGINT) AS w_max"))
      case 1 =>
        val c = pick(rnd, Vector("o_totalprice", "l_extendedprice"))
        (s"CAST(dense_rank() OVER (PARTITION BY $pkey ORDER BY $c) AS BIGINT)",
          Seq("CAST(sum(w) AS BIGINT) AS w_sum",
            "CAST(max(w) AS BIGINT) AS w_max"))
      case _ =>
        val c = pick(rnd, Vector("l_quantity", "l_discount"))
        (s"sum(CAST($c AS DECIMAL(18,2))) OVER (PARTITION BY $pkey)",
          Seq("CAST(sum(w) AS DOUBLE) AS w_sum",
            "CAST(max(w) AS DOUBLE) AS w_max"))
    }
    val sql =
      s"""WITH b AS (
         |  SELECT $pkey AS k, $winExpr AS w
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE $pred)
         |SELECT k, count(1) AS n, ${outerAggs.mkString(", ")}
         |FROM b GROUP BY k""".stripMargin
    QueryDef(f"q_fuzzjw_$i%02d", Some(sql))(
      (s, d) =>
        Tables(s, d, "lineitem")
          .join(Tables(s, d, "orders"), expr("l_orderkey = o_orderkey"))
          .where(pred)
          .select(col(pkey).as("k"), expr(s"$winExpr AS w"))
          .groupBy(col("k"))
          .agg(expr("count(1) AS n"), outerAggs.map(expr): _*))
  }

  // ---- scalar-function family: string/date expressions composed at
  // random and pushed through filter→group→agg — the eighth tier,
  // covering the surface where SQL dialects diverge most (substring
  // indexing, replace, case transforms, date part extraction). The
  // grammar stays inside proven cross-engine semantics: ASCII-only
  // fixture strings (upper/lower/reverse/trim agree), substr with
  // 1-based starts ≥ 1 (both dialects), replace/||-concat (identical),
  // binary string collation for min/max/GROUP BY, and date parts
  // CAST to BIGINT (Spark int32 vs DuckDB int64 widths). ----

  // the fixture's customer table carries two string columns
  private val custStrCols = Vector("c_name", "c_mktsegment")

  private def strExpr(rnd: Random): String = {
    val c = pick(rnd, custStrCols)
    rnd.nextInt(6) match {
      case 0 => s"upper($c)"
      case 1 => s"lower($c)"
      case 2 => s"substr($c, ${1 + rnd.nextInt(5)}, ${1 + rnd.nextInt(8)})"
      case 3 => s"replace(lower($c), '${pick(rnd, Vector("a", "e", "r", "0"))}'," +
        s" '${pick(rnd, Vector("", "_", "xx"))}')"
      case 4 => s"reverse(substr($c, 1, ${2 + rnd.nextInt(6)}))"
      case 5 => s"upper($c) || '#' || lower(${pick(rnd, custStrCols)})"
    }
  }

  private def genScalar(i: Int): QueryDef = {
    val rnd = new Random(seed * 472882027L + i)
    if (i % 2 == 0) {
      // string shape over customer
      val keyExpr = pick(rnd, Vector(
        s"substr(c_name, ${10 + rnd.nextInt(6)}, 1)",
        "upper(c_mktsegment)",
        s"CAST(length(c_name) % ${2 + rnd.nextInt(4)} AS BIGINT)"))
      val s1 = strExpr(rnd)
      val s2 = strExpr(rnd)
      val pred = s"c_custkey % ${2 + rnd.nextInt(5)} = ${rnd.nextInt(2)}" +
        s" AND c_acctbal ${pick(rnd, cmpOps)} ${-500 + rnd.nextInt(9000)}"
      val sql =
        s"""SELECT $keyExpr AS k, count(1) AS n,
           |  CAST(sum(length($s1)) AS BIGINT) AS len_sum,
           |  min($s2) AS mn, max($s2) AS mx
           |FROM customer
           |WHERE $pred
           |GROUP BY $keyExpr""".stripMargin
      QueryDef(f"q_fuzzf_$i%02d", Some(sql))(
        (s, d) =>
          Tables(s, d, "customer")
            .where(pred)
            .groupBy(expr(s"$keyExpr AS k"))
            .agg(expr("count(1) AS n"),
              expr(s"CAST(sum(length($s1)) AS BIGINT) AS len_sum"),
              expr(s"min($s2) AS mn"), expr(s"max($s2) AS mx")))
    } else {
      // date shape over orders
      val part = pick(rnd, Vector("year", "month", "day"))
      val pred = s"o_custkey % ${2 + rnd.nextInt(4)} = ${rnd.nextInt(2)}" +
        s" AND o_orderstatus ${if (rnd.nextBoolean()) "=" else "<>"} 'O'"
      val sql =
        s"""SELECT CAST($part(o_orderdate) AS BIGINT) AS k,
           |  count(1) AS n,
           |  CAST(min(month(o_orderdate)) AS BIGINT) AS mn_m,
           |  CAST(max(day(o_orderdate)) AS BIGINT) AS mx_d,
           |  min(o_orderpriority) AS mn_p
           |FROM orders
           |WHERE $pred
           |GROUP BY CAST($part(o_orderdate) AS BIGINT)""".stripMargin
      QueryDef(f"q_fuzzf_$i%02d", Some(sql))(
        (s, d) =>
          Tables(s, d, "orders")
            .where(pred)
            .groupBy(expr(s"CAST($part(o_orderdate) AS BIGINT) AS k"))
            .agg(expr("count(1) AS n"),
              expr("CAST(min(month(o_orderdate)) AS BIGINT) AS mn_m"),
              expr("CAST(max(day(o_orderdate)) AS BIGINT) AS mx_d"),
              expr("min(o_orderpriority) AS mn_p")))
    }
  }

  // ---- bit-arithmetic family: random `&` / `|` / `*2^k` / `%`
  // expressions over the long columns, grouped by a derived bucket —
  // the ninth tier, probing exactly the cross-dialect surface the
  // Z-order audit rests on (bit ops share syntax but NOT precedence,
  // so every generated node is fully parenthesized; `^` is XOR in
  // Spark but POWER in DuckDB and is deliberately absent; operands
  // stay < 2^32 so no product leaves int64). ----

  private def bitExpr(rnd: Random): String = {
    val c = pick(rnd, longCols)
    val m1 = 1 + rnd.nextInt(4095)
    val m2 = 1 + rnd.nextInt(65535)
    val sh = 1 << (1 + rnd.nextInt(8))
    rnd.nextInt(4) match {
      case 0 => s"($c & $m1)"
      case 1 => s"(($c & $m1) | (($c * $sh) & $m2))"
      case 2 => s"((($c % ${2 + rnd.nextInt(251)}) * $sh) & $m2)"
      case 3 => s"(($c | $m1) & $m2)"
    }
  }

  private def genBits(i: Int): QueryDef = {
    val rnd = new Random(seed * 7000 + i)
    val e1 = bitExpr(rnd)
    val e2 = bitExpr(rnd)
    // modulo-only predicate: ~1/m of rows at ANY scale — the general
    // atom() pool draws key equalities that select nothing on the
    // small fixtures, and an empty result compares trivially
    val m = 2 + rnd.nextInt(5)
    val pred = s"${pick(rnd, longCols)} % $m = ${rnd.nextInt(m)}"
    val nb = 2 + rnd.nextInt(7)
    val sql =
      s"""SELECT CAST($e1 % $nb AS BIGINT) AS b, count(1) AS n,
         |  CAST(sum($e2) AS BIGINT) AS bit_sum,
         |  CAST(min($e2) AS BIGINT) AS mn,
         |  CAST(max($e2) AS BIGINT) AS mx
         |FROM lineitem
         |WHERE $pred
         |GROUP BY CAST($e1 % $nb AS BIGINT)""".stripMargin
    QueryDef(f"q_fuzzb_$i%02d", Some(sql))(
      (s, d) =>
        Tables(s, d, "lineitem")
          .where(pred)
          .groupBy(expr(s"CAST($e1 % $nb AS BIGINT) AS b"))
          .agg(expr("count(1) AS n"),
            expr(s"CAST(sum($e2) AS BIGINT) AS bit_sum"),
            expr(s"CAST(min($e2) AS BIGINT) AS mn"),
            expr(s"CAST(max($e2) AS BIGINT) AS mx")))
  }

  // ---- rollup/cube family: filter → multi-level grouping → pinned
  // aggregates — the tenth tier, probing the Expand-based grouping-
  // sets rewrite from generated text. Keys are STRINGS only (a raw
  // flag column plus a derived CASE band), so the rolled-up NULL
  // markers land as object-dtype None on both sides of the driver's
  // pandas hash — no int-with-NULL width question. The DataFrame
  // side renders .rollup()/.cube() (same Expand plan Spark gives the
  // SQL text); DuckDB runs the generated ROLLUP/CUBE clause.
  // Predicates are MODULO-ONLY (the bits-tier rule) and additionally
  // load-bearing here: on EMPTY input DuckDB's ROLLUP emits the
  // standard grand-total row while Spark emits zero rows, so a
  // nothing-selecting predicate is a false dialect mismatch, not a
  // bug in either engine. ----

  private def genRollup(i: Int): QueryDef = {
    val rnd = new Random(seed * 982451653L + i)
    val m = 2 + rnd.nextInt(5)
    val pred = s"${pick(rnd, longCols)} % $m = ${rnd.nextInt(m)}"
    val k1 = pick(rnd, Vector("l_returnflag", "l_linestatus"))
    val lo = 10 + rnd.nextInt(20)
    val caseExpr = s"CASE WHEN l_quantity < $lo THEN 'lo' " +
      s"WHEN l_quantity < ${lo + 10 + rnd.nextInt(10)} THEN 'mid' " +
      "ELSE 'hi' END"
    val ags = aggs(rnd)
    val useCube = i % 2 == 1
    val op = if (useCube) "CUBE" else "ROLLUP"
    val sql =
      s"""SELECT $k1, $caseExpr AS qb, ${ags.mkString(", ")}
         |FROM lineitem
         |WHERE $pred
         |GROUP BY $op ($k1, $caseExpr)""".stripMargin
    QueryDef(f"q_fuzzr_$i%02d", Some(sql))(
      (s, d) => {
        val base = Tables(s, d, "lineitem").where(pred)
        val g =
          if (useCube) base.cube(col(k1), expr(s"$caseExpr AS qb"))
          else base.rollup(col(k1), expr(s"$caseExpr AS qb"))
        g.agg(expr(ags.head), ags.tail.map(expr): _*)
      })
  }

  // ---- RANGE-frame window family: value-based frames over integer
  // cents — the eleventh tier. RANGE frames are tie-order-invariant
  // BY DEFINITION (peers share the frame), so unlike the ROWS tier no
  // per-shape invariance argument is needed; what this tier probes is
  // the frame-boundary arithmetic itself (peer inclusion, numeric
  // offset comparison) across engines. ORDER BY and offsets stay in
  // BIGINT cents; aggregates of w are width-pinned as usual.
  // Modulo-only predicates (never-empty rule). ----

  private def genRange(i: Int): QueryDef = {
    val rnd = new Random(seed * 15487469L + i)
    val m = 2 + rnd.nextInt(5)
    val pred = s"${pick(rnd, longCols)} % $m = ${rnd.nextInt(m)}"
    val pkey = pick(rnd, keyPool)
    val r = (1 + rnd.nextInt(50)) * 100L
    val winExpr = rnd.nextInt(3) match {
      case 0 => s"CAST(sum(v) OVER (PARTITION BY k ORDER BY v " +
        s"RANGE BETWEEN $r PRECEDING AND CURRENT ROW) AS BIGINT)"
      case 1 => s"CAST(count(1) OVER (PARTITION BY k ORDER BY v " +
        s"RANGE BETWEEN $r PRECEDING AND $r FOLLOWING) AS BIGINT)"
      case 2 => s"CAST(max(v) OVER (PARTITION BY k ORDER BY v " +
        s"RANGE BETWEEN $r PRECEDING AND CURRENT ROW) AS BIGINT)"
    }
    val sql =
      s"""WITH c AS (
         |  SELECT $pkey AS k,
         |    CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS v
         |  FROM lineitem WHERE $pred),
         |b AS (SELECT k, $winExpr AS w FROM c)
         |SELECT k, count(1) AS n, CAST(sum(w) AS BIGINT) AS w_sum,
         |  CAST(min(w) AS BIGINT) AS w_min, CAST(max(w) AS BIGINT) AS w_max
         |FROM b GROUP BY k""".stripMargin
    QueryDef(f"q_fuzzg_$i%02d", Some(sql))(
      (s, d) =>
        Tables(s, d, "lineitem")
          .where(pred)
          .select(col(pkey).as("k"),
            expr("CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)").as("v"))
          .select(col("k"), expr(s"$winExpr AS w"))
          .groupBy(col("k"))
          .agg(expr("count(1) AS n"), expr("CAST(sum(w) AS BIGINT) AS w_sum"),
            expr("CAST(min(w) AS BIGINT) AS w_min"),
            expr("CAST(max(w) AS BIGINT) AS w_max")))
  }

  // ---- outer-join family: lineitem LEFT JOIN a FILTERED orders
  // slice, aggregated per lineitem key — the twelfth tier, probing
  // NULL propagation through outer joins from generated text:
  // count(col) vs count(1) on the nullable side, min/max over
  // partially-NULL groups, and conditional sums that must treat
  // unmatched rows as absent. Aggregates over the nullable side CAST
  // to BIGINT as usual; groups whose orders side is entirely NULL
  // emit NULL mn/mx — both engines land them as the same pandas
  // NULL-widened dtype, symmetric through the driver hash. Left-side
  // predicate is modulo-only (never empty); the right-side filter is
  // what manufactures the unmatched rows. ----

  private def genOuter(i: Int): QueryDef = {
    val rnd = new Random(seed * 86028121L + i)
    val m = 2 + rnd.nextInt(5)
    val pred = s"${pick(rnd, longCols)} % $m = ${rnd.nextInt(m)}"
    val oFilter = ordersAtom(rnd)
    val key = pick(rnd, keyPool)
    val sql =
      s"""WITH o AS (
         |  SELECT o_orderkey, o_custkey,
         |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS ocents
         |  FROM orders WHERE $oFilter)
         |SELECT $key, count(1) AS n,
         |  count(o.o_orderkey) AS n_matched,
         |  CAST(min(o.ocents) AS BIGINT) AS mn,
         |  CAST(max(o.ocents) AS BIGINT) AS mx,
         |  count(DISTINCT o.o_custkey) AS nd
         |FROM lineitem LEFT JOIN o ON l_orderkey = o.o_orderkey
         |WHERE $pred
         |GROUP BY $key""".stripMargin
    QueryDef(f"q_fuzzo_$i%02d", Some(sql))(
      (s, d) => {
        val o = Tables(s, d, "orders").where(oFilter)
          .select(col("o_orderkey"), col("o_custkey"),
            expr("CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)").as("ocents"))
        Tables(s, d, "lineitem").where(pred)
          .join(o, expr("l_orderkey = o_orderkey"), "left")
          .groupBy(col(key))
          .agg(expr("count(1) AS n"),
            expr("count(o_orderkey) AS n_matched"),
            expr("CAST(min(ocents) AS BIGINT) AS mn"),
            expr("CAST(max(ocents) AS BIGINT) AS mx"),
            expr("count(DISTINCT o_custkey) AS nd"))
      })
  }

  // ---- conditional-aggregate family: CASE expressions INSIDE the
  // aggregate functions (sum of a guarded column, count of matches,
  // min/max over a possibly-all-NULL branch) — the thirteenth tier,
  // probing conditional-aggregation rewrites from generated text.
  // `count(CASE WHEN .. THEN 1 END)` counts non-NULLs in both
  // dialects; min/max over an all-NULL group emit NULL BIGINT, which
  // pandas NULL-widens identically on both sides (the outer-join-tier
  // precedent). Predicates are modulo-only (never-empty rule); all
  // integer aggregates CAST to BIGINT as usual. ----

  private def genCase(i: Int): QueryDef = {
    val rnd = new Random(seed * 275604541L + i)
    val m = 2 + rnd.nextInt(5)
    val pred = s"${pick(rnd, longCols)} % $m = ${rnd.nextInt(m)}"
    val key = pick(rnd, keyPool)
    val condA = atom(rnd)
    val condB = atom(rnd)
    val c1 = pick(rnd, longCols)
    val c2 = pick(rnd, longCols)
    val ags = Seq(
      "count(1) AS n",
      s"CAST(sum(CASE WHEN $condA THEN $c1 ELSE 0 END) AS BIGINT) AS s_cond",
      s"count(CASE WHEN $condB THEN 1 END) AS n_cond",
      s"CAST(min(CASE WHEN $condA THEN $c2 END) AS BIGINT) AS mn_cond",
      s"CAST(max(CASE WHEN $condB THEN $c2 END) AS BIGINT) AS mx_cond")
    val sql =
      s"""SELECT $key, ${ags.mkString(", ")}
         |FROM lineitem
         |WHERE $pred
         |GROUP BY $key""".stripMargin
    QueryDef(f"q_fuzzc_$i%02d", Some(sql))(
      (s, d) =>
        Tables(s, d, "lineitem")
          .where(pred)
          .groupBy(col(key))
          .agg(expr(ags.head), ags.tail.map(expr): _*))
  }

  // ---- null-logic family: NULLIF manufactures NULLs from never-null
  // fixture columns, which then flow through coalesce, the
  // null-skipping aggregates (count/min/max ignore NULLs in both
  // dialects), and IS DISTINCT FROM (the only equality that treats
  // NULL as a comparable value) — the fourteenth tier, probing
  // three-valued-logic rewrites from generated text. Predicates are
  // modulo-only (never-empty rule); every integer aggregate CASTs to
  // BIGINT as usual; an all-NULL min/max group NULL-widens identically
  // on both sides (the outer-join-tier precedent). ----

  private def genNull(i: Int): QueryDef = {
    val rnd = new Random(seed * 179424673L + i)
    val m = 2 + rnd.nextInt(5)
    val pred = s"${pick(rnd, longCols)} % $m = ${rnd.nextInt(m)}"
    val key = pick(rnd, keyPool)
    val c1 = pick(rnd, longCols)
    val c2 = pick(rnd, longCols)
    val k1 = 2 + rnd.nextInt(6)
    val r1 = rnd.nextInt(k1)
    val k2 = 2 + rnd.nextInt(6)
    val r2 = rnd.nextInt(k2)
    val k3 = 2 + rnd.nextInt(4)
    val r3 = rnd.nextInt(k3)
    val ags = Seq(
      "count(1) AS n",
      s"count(NULLIF($c1 % $k1, $r1)) AS n_nonnull",
      s"CAST(sum(coalesce(NULLIF($c1 % $k2, $r2), -1)) AS BIGINT) AS s_coal",
      s"CAST(sum(CASE WHEN NULLIF($c1 % $k3, $r3)" +
        s" IS DISTINCT FROM NULLIF($c2 % $k3, $r3)" +
        " THEN 1 ELSE 0 END) AS BIGINT) AS n_dfrom",
      s"CAST(max(NULLIF($c2 % $k1, $r1)) AS BIGINT) AS mx_n")
    val sql =
      s"""SELECT $key, ${ags.mkString(", ")}
         |FROM lineitem
         |WHERE $pred
         |GROUP BY $key""".stripMargin
    QueryDef(f"q_fuzzn_$i%02d", Some(sql))(
      (s, d) =>
        Tables(s, d, "lineitem")
          .where(pred)
          .groupBy(col(key))
          .agg(expr(ags.head), ags.tail.map(expr): _*))
  }

  // ---- derived-table family: an aggregate subquery in FROM with an
  // OUTER filter and integer arithmetic over the aggregated columns —
  // the fifteenth tier, probing filter-through-aggregate and
  // subquery-merge rewrites from generated text (the outer WHERE is a
  // HAVING in disguise that the optimizer may or may not push).
  // Aggregates are over non-negative key columns, so the derived
  // integer division has no floor-vs-truncate divergence; widths CAST
  // to BIGINT as usual; modulo-only inner predicate (never-empty). ----

  private def genDerived(i: Int): QueryDef = {
    val rnd = new Random(seed * 961748941L + i)
    val m = 2 + rnd.nextInt(5)
    val pred = s"${pick(rnd, longCols)} % $m = ${rnd.nextInt(m)}"
    val key = pick(rnd, keyPool)
    val c = pick(rnd, longCols)
    val m2 = 2 + rnd.nextInt(6)
    val r2 = rnd.nextInt(m2)
    val m3 = 3 + rnd.nextInt(7)
    val r3 = rnd.nextInt(m3)
    val sql =
      s"""SELECT key, s, n, CAST(s DIV n AS BIGINT) AS avg_i,
         |  CAST((s + n) % $m3 AS BIGINT) AS mix_mod
         |FROM (SELECT $key AS key, CAST(sum($c) AS BIGINT) AS s,
         |        count(1) AS n
         |      FROM lineitem WHERE $pred GROUP BY $key) t
         |WHERE n % $m2 = $r2 OR s % $m3 = $r3""".stripMargin
    QueryDef(f"q_fuzzd_$i%02d", Some(sql.replace(" DIV ", " // ")))(
      (s, d) =>
        Tables(s, d, "lineitem")
          .where(pred)
          .groupBy(col(key).as("key"))
          .agg(expr(s"CAST(sum($c) AS BIGINT) AS s"),
            expr("count(1) AS n"))
          .where(expr(s"n % $m2 = $r2 OR s % $m3 = $r3"))
          .select(col("key"), col("s"), col("n"),
            expr("CAST(s DIV n AS BIGINT) AS avg_i"),
            expr(s"CAST((s + n) % $m3 AS BIGINT) AS mix_mod")))
  }

  val defs: Seq[QueryDef] =
    (0 until N).map(gen) ++ (0 until 6).map(genJoin) ++
      (0 until 6).map(genWindow) ++ (0 until 8).map(genSub) ++
      (0 until 4).map(genSet) ++ (0 until 6).map(genTopk) ++
      (0 until 6).map(genJoinWindow) ++ (0 until 8).map(genScalar) ++
      (0 until 6).map(genBits) ++ (0 until 6).map(genRollup) ++
      (0 until 6).map(genRange) ++ (0 until 6).map(genOuter) ++
      (0 until 6).map(genCase) ++ (0 until 6).map(genNull) ++
      (0 until 6).map(genDerived)
}
