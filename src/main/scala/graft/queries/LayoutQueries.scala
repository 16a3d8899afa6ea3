package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._


/** Data-layout operators: multi-dimensional clustering (Z-order) and
  * the zone-map pruning audit that justifies it. The reference's sink
  * writes partition-key-grouped files (verizon_table_migration_Rakesh_
  * filters.py:347-353); at 100 TB the next lever after partitioning is
  * HOW rows are ordered WITHIN files — min/max footer stats only prune
  * when the layout clusters the filtered columns. Z-order interleaves
  * the bits of two keys so ranges of BOTH columns stay clustered, where
  * a linear sort clusters only its leading key.
  *
  * Everything here is exact integer arithmetic (bit spread via
  * `(x | x*2^k) & mask`, grid scaling via `floor(a/b)` with magnitudes
  * where IEEE-double division is exact), so the full audit — layout,
  * zone maps, pruning decision — has a bit-exact DuckDB twin.
  */
object LayoutQueries {

  /** Morton spread: bit i of an 8..16-bit value moves to bit 2i.
    * Standard magic-number spread written with only `|`, `&` and
    * multiplication by powers of two — identical text runs in Spark
    * and DuckDB (neither dialect shift operator is shared, `*2^k`
    * is). Fully parenthesized: `&`/`|` precedence differs across
    * dialects. */
  private def spreadSql(x: String): String = {
    val s1 = s"((($x) | (($x) * 256)) & 16711935)"
    val s2 = s"(($s1 | ($s1 * 16)) & 252645135)"
    val s3 = s"(($s2 | ($s2 * 4)) & 858993459)"
    s"(($s3 | ($s3 * 2)) & 1431655765)"
  }

  /** Scale `c` in [lo,hi] to the 0..255 grid. Exact despite the
    * double division: a = (c-lo)*256 < 2^45 and the quotient is
    * < 2^8, so floor(a/b) cannot misround (the true quotient is
    * always >= 2^-45 away from the next integer, far above the
    * double spacing at this magnitude). */
  private def gridSql(c: String, lo: String, hi: String): String =
    s"CAST(floor((($c - $lo) * 256.0) / (($hi - $lo) + 1)) AS BIGINT)"

  // The audit's probe predicate, a 2-D box in grid coordinates —
  // deliberately NOT aligned to bucket boundaries (an aligned box
  // would flatter z-order).
  private val (pLo, pHi, sLo, sHi) = (100, 140, 90, 130)

  private def prunedSql(pmin: String, pmax: String, smin: String, smax: String) =
    s"$pmax < $pLo OR $pmin > $pHi OR $smax < $sLo OR $smin > $sHi"

  /** The audit's DuckDB twin — also reused as a building block by the
    * migration-readiness e2e report. */
  private[queries] val zorderSql: String = {
    val g1 = gridSql("l_partkey", "plo", "phi")
    val g2 = gridSql("l_suppkey", "slo", "shi")
    val pr = prunedSql("pmin", "pmax", "smin", "smax")
    s"""WITH st AS (
       |  SELECT min(l_partkey) AS plo, max(l_partkey) AS phi,
       |         min(l_suppkey) AS slo, max(l_suppkey) AS shi
       |  FROM lineitem),
       |g AS (SELECT $g1 AS pg, $g2 AS sg FROM lineitem, st),
       |z AS (SELECT pg, sg,
       |        (${spreadSql("pg")} + 2 * ${spreadSql("sg")}) AS zv
       |      FROM g),
       |b AS (SELECT pg, sg,
       |        CAST(floor(zv / 1024.0) AS BIGINT) AS bz,
       |        CAST(floor(pg / 4.0) AS BIGINT) AS bl
       |      FROM z),
       |zones AS (
       |  SELECT 'zorder' AS layout, bz AS bucket,
       |    min(pg) AS pmin, max(pg) AS pmax,
       |    min(sg) AS smin, max(sg) AS smax, count(*) AS n
       |  FROM b GROUP BY bz
       |  UNION ALL
       |  SELECT 'linear' AS layout, bl AS bucket,
       |    min(pg) AS pmin, max(pg) AS pmax,
       |    min(sg) AS smin, max(sg) AS smax, count(*) AS n
       |  FROM b GROUP BY bl)
       |SELECT layout, count(*) AS n_buckets,
       |  CAST(sum(CASE WHEN $pr THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
       |  CAST(sum(n) AS BIGINT) AS rows_total,
       |  CAST(sum(CASE WHEN $pr THEN 0 ELSE n END) AS BIGINT)
       |    AS rows_scanned
       |FROM zones GROUP BY layout""".stripMargin
  }

  // ---------- Hilbert xy→d (8-bit grid, n = 256) ----------

  /** Bit levels, highest first: the xy2d loop's `s`. */
  private val hilbertSteps = Seq(128, 64, 32, 16, 8, 4, 2, 1)

  private def rxSql(s: Int) =
    s"(CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END)"
  private def rySql(s: Int) =
    s"(CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)"

  /** d += s²·((3·rx) XOR ry), the XOR written as CASE (no shared XOR
    * operator across dialects): rx=0 → ry, rx=1 → 3−ry. */
  private def dStepSql(s: Int) =
    s"(d + ${s * s} * (CASE WHEN rx = 1 THEN 3 - ry ELSE ry END))"

  /** Quadrant rotate/reflect: when ry=0, reflect by 255−· iff rx=1,
    * then swap x/y (the reflection uses the FULL 255 complement — the
    * already-consumed high bits must flip with the low ones, exactly
    * as the reference algorithm's n−1−x does). */
  private val xStepSql =
    "(CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 255 - y ELSE y END)" +
      " ELSE x END)"
  private val yStepSql =
    "(CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 255 - x ELSE x END)" +
      " ELSE y END)"

  /** Applies the unrolled xy2d chain to a frame with integer columns
    * (x, y) in [0, 256), replacing them with curve position `d`; all
    * other columns pass through. Shared by `q_layout_hilbert` and
    * HilbertSpec (which proves the mapping is a Hamiltonian unit-step
    * walk over the full 256×256 grid). */
  private[graft] def hilbertD(df: DataFrame): DataFrame = {
    val others = df.columns.filterNot(Set("x", "y")).map(col)
    var h = df.select(others :+ col("x") :+ col("y") :+
      lit(0L).as("d"): _*)
    for (s <- hilbertSteps) {
      h = h
        .select(others :+ col("x") :+ col("y") :+ col("d") :+
          expr(rxSql(s)).as("rx") :+ expr(rySql(s)).as("ry"): _*)
        .select(others :+ expr(xStepSql).as("x") :+
          expr(yStepSql).as("y") :+ expr(dStepSql(s)).as("d"): _*)
    }
    h.select(others :+ col("d"): _*)
  }

  /** DuckDB: the 8 unrolled steps as a nested-subquery chain over the
    * grid CTE `g`; emits columns (pg, sg, d). */
  private val hilbertChainSql: String =
    hilbertSteps.zipWithIndex.foldLeft(
      "(SELECT pg, sg, 0 AS d, pg AS x, sg AS y FROM g)") {
      case (inner, (s, i)) =>
        s"""(SELECT pg, sg, ${dStepSql(s)} AS d,
           |  $xStepSql AS x, $yStepSql AS y
           |FROM (SELECT pg, sg, d, x, y,
           |    ${rxSql(s)} AS rx, ${rySql(s)} AS ry
           |  FROM $inner h${i}a) h${i}b)""".stripMargin
    }

  val defs: Seq[QueryDef] = Seq(

    // ---- Z-order vs linear layout: zone-map pruning audit. Scales
    // (l_partkey, l_suppkey) to an 8-bit grid, Morton-interleaves to a
    // 16-bit z-value, buckets rows by the z prefix (64 buckets = the
    // files a repartitionByRange(zv)+sortWithinPartitions write would
    // produce) and by a partkey-only linear sort, then evaluates a
    // 2-D box predicate against each layout's per-bucket min/max zone
    // maps. Output: buckets pruned + rows scanned per layout — the
    // number a table optimizer would use to decide the rewrite.
    // Plan: one scalar agg (broadcast back), per-row codegen'd bit
    // math, then BOTH layouts' zone maps from a single grouping-sets
    // pass — one scan, one Expand(×2), one shuffle of 64-key
    // partials; no sort, no window, no cache. Locally a persist+two-
    // agg variant measures ~25% faster (Expand breaks the codegen
    // span), but it materializes a corpus-sized 4-column cache — at
    // 100 TB that is the wrong trade, so the single-scan form is the
    // one shipped. The audit costs O(rows) regardless of table
    // size. ----
    QueryDef("q_layout_zorder", Some(zorderSql))((s, d) => {
      val li = Tables(s, d, "lineitem").select("l_partkey", "l_suppkey")
      val st = li.agg(
        min("l_partkey").as("plo"), max("l_partkey").as("phi"),
        min("l_suppkey").as("slo"), max("l_suppkey").as("shi"))
      val b = li.crossJoin(broadcast(st))
        .select(
          expr(gridSql("l_partkey", "plo", "phi")).as("pg"),
          expr(gridSql("l_suppkey", "slo", "shi")).as("sg"))
        .select(col("pg"), col("sg"),
          expr(s"${spreadSql("pg")} + 2 * ${spreadSql("sg")}").as("zv"))
        .select(col("pg"), col("sg"),
          expr("CAST(floor(zv / 1024.0) AS BIGINT)").as("bz"),
          expr("CAST(floor(pg / 4.0) AS BIGINT)").as("bl"))
      // grouping_id over (bz, bl): set (bz) -> bl aggregated -> gid 1,
      // set (bl) -> gid 2
      val zones = b
        .groupingSets(Seq(Seq(col("bz")), Seq(col("bl"))),
          col("bz"), col("bl"))
        .agg(grouping_id().as("gid"),
          min("pg").as("pmin"), max("pg").as("pmax"),
          min("sg").as("smin"), max("sg").as("smax"),
          count(lit(1)).as("n"))
        .select(
          when(col("gid") === 1, "zorder").otherwise("linear").as("layout"),
          coalesce(col("bz"), col("bl")).as("bucket"), col("pmin"),
          col("pmax"), col("smin"), col("smax"), col("n"))
      val pruned = expr(prunedSql("pmin", "pmax", "smin", "smax"))
      zones
        .groupBy("layout")
        .agg(count(lit(1)).as("n_buckets"),
          sum(when(pruned, 1L).otherwise(0L)).cast("bigint").as("n_pruned"),
          sum("n").cast("bigint").as("rows_total"),
          sum(when(pruned, 0L).otherwise(col("n"))).cast("bigint")
            .as("rows_scanned"))
    }),

    // ---- Hilbert-curve layout vs Z-order: the same zone-map pruning
    // audit run over BOTH space-filling curves. Hilbert preserves
    // locality strictly better than Morton (every consecutive pair of
    // curve positions is grid-adjacent; Morton has long diagonal
    // jumps at quadrant boundaries), so Hilbert buckets have tighter
    // per-bucket bounding boxes and prune more — this query measures
    // by how much on real data. The xy→d mapping is the standard
    // 8-level rotate/reflect recursion (Wikipedia "Hilbert curve"
    // xy2d) unrolled into integer CASE arithmetic shared verbatim by
    // both dialects (&, CASE, +, * only; HilbertSpec proves the
    // mapping is a Hamiltonian unit-step walk). Scale: per-row O(8)
    // integer ops in one codegen'd projection; each layout's zone
    // maps come from a 64-key hash-agg — identical cost profile to
    // q_layout_zorder, O(rows) total. ----
    QueryDef("q_layout_hilbert", Some {
      val g1 = gridSql("l_partkey", "plo", "phi")
      val g2 = gridSql("l_suppkey", "slo", "shi")
      val pr = prunedSql("pmin", "pmax", "smin", "smax")
      s"""WITH st AS (
         |  SELECT min(l_partkey) AS plo, max(l_partkey) AS phi,
         |         min(l_suppkey) AS slo, max(l_suppkey) AS shi
         |  FROM lineitem),
         |g AS (SELECT $g1 AS pg, $g2 AS sg FROM lineitem, st),
         |h AS (SELECT pg, sg, d AS hv FROM $hilbertChainSql hc),
         |z AS (SELECT pg, sg,
         |        (${spreadSql("pg")} + 2 * ${spreadSql("sg")}) AS zv
         |      FROM g),
         |zones AS (
         |  SELECT 'hilbert' AS layout,
         |    CAST(floor(hv / 1024.0) AS BIGINT) AS bucket,
         |    min(pg) AS pmin, max(pg) AS pmax,
         |    min(sg) AS smin, max(sg) AS smax, count(*) AS n
         |  FROM h GROUP BY 2
         |  UNION ALL
         |  SELECT 'zorder' AS layout,
         |    CAST(floor(zv / 1024.0) AS BIGINT) AS bucket,
         |    min(pg) AS pmin, max(pg) AS pmax,
         |    min(sg) AS smin, max(sg) AS smax, count(*) AS n
         |  FROM z GROUP BY 2)
         |SELECT layout, count(*) AS n_buckets,
         |  CAST(sum(CASE WHEN $pr THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
         |  CAST(sum(n) AS BIGINT) AS rows_total,
         |  CAST(sum(CASE WHEN $pr THEN 0 ELSE n END) AS BIGINT)
         |    AS rows_scanned
         |FROM zones GROUP BY layout""".stripMargin
    })((s, d) => {
      val li = Tables(s, d, "lineitem").select("l_partkey", "l_suppkey")
      val st = li.agg(
        min("l_partkey").as("plo"), max("l_partkey").as("phi"),
        min("l_suppkey").as("slo"), max("l_suppkey").as("shi"))
      val g = li.crossJoin(broadcast(st))
        .select(
          expr(gridSql("l_partkey", "plo", "phi")).as("pg"),
          expr(gridSql("l_suppkey", "slo", "shi")).as("sg"))
      var h = g.select(col("pg"), col("sg"), lit(0L).as("d"),
        col("pg").as("x"), col("sg").as("y"))
      for (step <- hilbertSteps) {
        h = h
          .select(col("pg"), col("sg"), col("d"), col("x"), col("y"),
            expr(rxSql(step)).as("rx"), expr(rySql(step)).as("ry"))
          .select(col("pg"), col("sg"),
            expr(dStepSql(step)).as("d"),
            expr(xStepSql).as("x"), expr(yStepSql).as("y"))
      }
      val hz = h.select(col("pg"), col("sg"), col("d").as("bv"),
          lit("hilbert").as("layout"))
        .unionAll(g.select(col("pg"), col("sg"),
          expr(s"${spreadSql("pg")} + 2 * ${spreadSql("sg")}").as("bv"),
          lit("zorder").as("layout")))
      val zones = hz
        .select(col("layout"), col("pg"), col("sg"),
          expr("CAST(floor(bv / 1024.0) AS BIGINT)").as("bucket"))
        .groupBy(col("layout"), col("bucket"))
        .agg(min("pg").as("pmin"), max("pg").as("pmax"),
          min("sg").as("smin"), max("sg").as("smax"),
          count(lit(1)).as("n"))
      val pruned = expr(prunedSql("pmin", "pmax", "smin", "smax"))
      zones
        .groupBy("layout")
        .agg(count(lit(1)).as("n_buckets"),
          sum(when(pruned, 1L).otherwise(0L)).cast("bigint").as("n_pruned"),
          sum("n").cast("bigint").as("rows_total"),
          sum(when(pruned, 0L).otherwise(col("n"))).cast("bigint")
            .as("rows_scanned"))
    }))
}
