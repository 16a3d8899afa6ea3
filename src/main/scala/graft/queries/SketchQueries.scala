package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.GraftFunctions
import graft.ops.TextOps.{h32, h32Sql}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Theta-sketch (KMV) surface: bounded-memory distinct estimation with
  * set operations — including INTERSECTION estimates, which HLL cannot
  * express without inclusion-exclusion blowup (SURVEY.md §2.4
  * extension; no sketching exists in the reference).
  *
  * Scale design: [[graft.functions.KmvSketchAgg]] carries O(k) state
  * per group through a standard partial-aggregation shuffle (map-side
  * combine on every executor), so per-group distinct estimation over
  * 100 TB shuffles k longs per group, not the value sets. The sketch
  * is a deterministic function of the input SET (the k smallest
  * distinct hashes), so — unlike approx_count_distinct's HLL++ — every
  * estimate is exactly reproducible by the DuckDB oracle via
  * `row_number() OVER (ORDER BY h) <= k`.
  *
  * All estimate arithmetic is exact cross-engine: hashes are the
  * engine's md5-h32 (uniform in [0, 2^32)), counts and thetas are
  * integers, and each estimate is a single double multiply+divide of
  * exactly-representable integer values.
  */
object SketchQueries {

  private val k = 64
  private val twoTo32 = 4294967296.0

  val defs: Seq[QueryDef] = Seq(

    // ---- per-group distinct estimate from a k-long sketch ----
    QueryDef("q_sketch_theta", Some(
      s"""WITH h AS (
         |  SELECT DISTINCT o_orderpriority AS priority,
         |    ${h32Sql("CAST(o_custkey AS VARCHAR)")} AS h
         |  FROM orders
         |),
         |r AS (
         |  SELECT priority, h,
         |    row_number() OVER (PARTITION BY priority ORDER BY h) AS rn
         |  FROM h
         |),
         |agg AS (
         |  SELECT priority, count(*) AS exact_distinct,
         |    max(CASE WHEN rn = $k THEN h END) AS theta
         |  FROM r GROUP BY priority
         |)
         |SELECT priority, exact_distinct,
         |  coalesce(theta, -1) AS theta,
         |  CASE WHEN exact_distinct < $k THEN CAST(exact_distinct AS DOUBLE)
         |       ELSE ${k - 1} * $twoTo32 / theta END AS est_distinct
         |FROM agg""".stripMargin))(
      (s, d) => {
        val sk = Tables(s, d, "orders")
          .select(col("o_orderpriority").as("priority"),
            h32(col("o_custkey").cast("string")).as("h"))
          .groupBy(col("priority"))
          .agg(GraftFunctions.kmv(col("h"), k).as("sketch"),
            countDistinct(col("h")).as("exact_distinct"))
        // a sketch smaller than k IS the exact distinct set
        sk.select(col("priority"), col("exact_distinct"),
          coalesce(when(size(col("sketch")) === k, element_at(col("sketch"), k)),
            lit(-1L)).as("theta"),
          when(size(col("sketch")) < k, col("exact_distinct").cast("double"))
            .otherwise(lit((k - 1) * twoTo32) / element_at(col("sketch"), k))
            .as("est_distinct"))
      }),

    // ---- sketch set ops: union AND intersection estimates from two
    // k-long sketches. theta = min(theta_A, theta_B); every retained
    // hash below theta is a uniform sample of A∪B at rate theta/2^32,
    // so counts below theta scale by 2^32/theta. ----
    QueryDef("q_sketch_theta_setops", Some(
      s"""WITH h AS (
         |  SELECT DISTINCT o_orderstatus AS st,
         |    ${h32Sql("CAST(o_custkey AS VARCHAR)")} AS h
         |  FROM orders WHERE o_orderstatus IN ('F', 'O')
         |),
         |r AS (
         |  SELECT st, h, row_number() OVER (PARTITION BY st ORDER BY h) AS rn
         |  FROM h
         |),
         |th AS (
         |  SELECT least(
         |    max(CASE WHEN st = 'F' AND rn = $k THEN h END),
         |    max(CASE WHEN st = 'O' AND rn = $k THEN h END)) AS theta
         |  FROM r
         |)
         |SELECT
         |  (SELECT count(DISTINCT h) FROM h) AS exact_union,
         |  (SELECT count(*) FROM (
         |     SELECT h FROM h GROUP BY h HAVING count(*) = 2)) AS exact_inter,
         |  (SELECT count(*) FROM h WHERE st = 'F' AND NOT EXISTS (
         |     SELECT 1 FROM h h2 WHERE h2.st = 'O' AND h2.h = h.h)) AS exact_a_not_b,
         |  (SELECT count(DISTINCT h.h) FROM h, th WHERE h.h < th.theta)
         |    * $twoTo32 / th.theta AS est_union,
         |  (SELECT count(*) FROM (
         |     SELECT h.h FROM h, th WHERE h.h < th.theta
         |     GROUP BY h.h HAVING count(*) = 2)) * $twoTo32 / th.theta AS est_inter,
         |  (SELECT count(*) FROM h, th WHERE h.st = 'F' AND h.h < th.theta
         |     AND NOT EXISTS (SELECT 1 FROM h h2 WHERE h2.st = 'O' AND h2.h = h.h))
         |    * $twoTo32 / th.theta AS est_a_not_b
         |FROM th""".stripMargin))(
      (s, d) => {
        // distinct (status, hash) pairs feed both the sketches and the
        // exact counts — one scan, persisted across the two consumers
        val hashed = Tables(s, d, "orders")
          .where(col("o_orderstatus").isin("F", "O"))
          .select(col("o_orderstatus").as("st"),
            h32(col("o_custkey").cast("string")).as("h"))
          .distinct()
          .persist()
        val sk = hashed.groupBy(col("st"))
          .agg(GraftFunctions.kmv(col("h"), k).as("sk"))
        val a = sk.where(col("st") === "F").select(col("sk").as("ska"))
        val b = sk.where(col("st") === "O").select(col("sk").as("skb"))
        val exacts = hashed.groupBy(col("h"))
          .agg(countDistinct(col("st")).as("n_st"),
            count(when(col("st") === "F", 1)).as("in_a"))
          .agg(count(lit(1)).as("exact_union"),
            count(when(col("n_st") === 2, 1)).as("exact_inter"),
            count(when(col("n_st") === 1 && col("in_a") === 1, 1)).as("exact_a_not_b"))
        // both sketches are full (>> k distinct custkeys per status),
        // asserted by element_at(_, k) failing under ANSI if not
        a.crossJoin(b).crossJoin(exacts)
          .withColumn("theta",
            least(element_at(col("ska"), k), element_at(col("skb"), k)))
          // every hash of a side below theta <= theta_side is retained
          // in that side's sketch, so filtering the sketches below
          // theta recovers the full uniform sample of each set
          .withColumn("ra", filter(col("ska"), x => x < col("theta")))
          .withColumn("rb", filter(col("skb"), x => x < col("theta")))
          .select(col("exact_union"), col("exact_inter"), col("exact_a_not_b"),
            (size(array_distinct(concat(col("ra"), col("rb"))))
              * lit(twoTo32) / col("theta")).as("est_union"),
            (size(array_intersect(col("ra"), col("rb")))
              * lit(twoTo32) / col("theta")).as("est_inter"),
            // a-not-b: retained A-sample hashes absent from B's sample —
            // exact set difference on the uniform sample below theta
            (size(array_except(col("ra"), col("rb")))
              * lit(twoTo32) / col("theta")).as("est_a_not_b"))
      }),

    // ---- bounded-memory quantiles from a deterministic hash sample:
    // keep rows whose key-hash lands in 1/rate of the 32-bit space —
    // a uniform Bernoulli sample that is a pure function of the data
    // (mergeable, partition-order-free), unlike t-digest/KLL whose
    // merge order leaks into the result. Sample quantiles approximate
    // the exact ones with error O(1/sqrt(n·rate)); both the sample
    // AND the exact quantiles are computed so the oracle pins each.
    // percentile() interpolation is IEEE-identical to DuckDB's
    // quantile_cont (proven by q_agg_percentile). ----
    QueryDef("q_sketch_quantile_sample", Some(
      s"""WITH s AS (
         |  SELECT c_mktsegment AS segment, c_acctbal,
         |    ${h32Sql("CAST(c_custkey AS VARCHAR)")} % 4 AS slot
         |  FROM customer
         |)
         |SELECT segment,
         |  count(*) FILTER (WHERE slot = 0) AS n_sampled,
         |  quantile_cont(c_acctbal, 0.5) FILTER (WHERE slot = 0) AS q50_sample,
         |  quantile_cont(c_acctbal, 0.5) AS q50_exact,
         |  quantile_cont(c_acctbal, 0.95) FILTER (WHERE slot = 0) AS q95_sample,
         |  quantile_cont(c_acctbal, 0.95) AS q95_exact
         |FROM s GROUP BY segment""".stripMargin))(
      (s, d) => {
        val c = Tables(s, d, "customer")
          .select(col("c_mktsegment").as("segment"), col("c_acctbal"),
            pmod(h32(col("c_custkey").cast("string")), lit(4L)).as("slot"))
        val inSample = col("slot") === 0
        c.groupBy(col("segment"))
          .agg(
            count(when(inSample, 1)).as("n_sampled"),
            percentile(when(inSample, col("c_acctbal")), lit(0.5)).as("q50_sample"),
            percentile(col("c_acctbal"), lit(0.5)).as("q50_exact"),
            percentile(when(inSample, col("c_acctbal")), lit(0.95)).as("q95_sample"),
            percentile(col("c_acctbal"), lit(0.95)).as("q95_exact"))
      }),

    // ---- mergeable KLL quantile sketch, rank-contract oracled: the
    // bounded-state path for percentiles at 100 TB (exact needs a
    // global sort or sharded cumsum; the sketch is one pass +
    // O(k·log(n/k)) state per group, and partial sketches merge).
    // Unlike the hash-sample above, KLL's merge order DOES leak into
    // which items are retained — so the entry outputs not the
    // estimates but their accuracy CONTRACT: the exact rank of each
    // sketch-estimated quartile must sit within 5% of target (the
    // deterministic compactor's worst case here is ~1.6%, see
    // KllSketch.scala). That flag holds under ANY merge order, which
    // is precisely what makes a merge-order-sensitive sketch
    // driver-hashable. Plan: one partial-agg shuffle for the sketch,
    // a sketch-sized window scan, then a broadcast of the |groups|×3
    // estimates back over the fact for the exact-rank audit. ----
    QueryDef("q_sketch_kll_quantile", Some(
      """SELECT l_returnflag AS rf, count(*) AS n,
        |  TRUE AS q25_ok, TRUE AS q50_ok, TRUE AS q75_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin))(
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        val sk = li.groupBy(col("l_returnflag").as("rf"))
          .agg(GraftFunctions.kll(col("l_extendedprice"), 400).as("sk"))
        // unpack into (value, weight) rows; weighted-rank scan per group
        val pairs = sk.select(col("rf"),
            explode(arrays_zip(col("sk.v"), col("sk.w"))).as("p"))
          .select(col("rf"), col("p.v").as("v"), col("p.w").as("w"))
        val wCum = Window.partitionBy(col("rf")).orderBy(col("v").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy(col("rf"))
        val est = pairs
          .withColumn("cum", sum(col("w")).over(wCum))
          .withColumn("tot", sum(col("w")).over(wAll))
          .groupBy(col("rf"))
          .agg(
            min(when(col("cum") >= lit(0.25) * col("tot"), col("v"))).as("e25"),
            min(when(col("cum") >= lit(0.50) * col("tot"), col("v"))).as("e50"),
            min(when(col("cum") >= lit(0.75) * col("tot"), col("v"))).as("e75"))
        li.select(col("l_returnflag").as("rf"), col("l_extendedprice").as("x"))
          .join(broadcast(est), "rf")
          .groupBy(col("rf"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("x") <= col("e25"), 1L).otherwise(0L)).as("r25"),
            sum(when(col("x") <= col("e50"), 1L).otherwise(0L)).as("r50"),
            sum(when(col("x") <= col("e75"), 1L).otherwise(0L)).as("r75"))
          .select(col("rf"), col("n"),
            (abs(col("r25") - lit(0.25) * col("n")) <= lit(0.05) * col("n")).as("q25_ok"),
            (abs(col("r50") - lit(0.50) * col("n")) <= lit(0.05) * col("n")).as("q50_ok"),
            (abs(col("r75") - lit(0.75) * col("n")) <= lit(0.05) * col("n")).as("q75_ok"))
      }),

    // ---- Misra-Gries frequent items, error-contract oracled: the
    // completeness dual of CountMin — finds WHICH keys are frequent
    // with k counters of state, no prior key list, partials merging
    // by the mergeable-summaries rule (MisraGries.scala). Like KLL,
    // merge order leaks into which borderline keys survive, so the
    // entry outputs the contract, not the estimates: for EVERY key,
    // est <= true and (true − est)·(k+1) <= n — deterministic TRUE
    // under any merge tree. (The fixture corpus is near-uniform —
    // 31 tokens, no key above n/(k+1) — so heavy-hitter completeness
    // is vacuous here; MisraGriesSpec exercises it on a skewed
    // stream.) Plan: explode → one O(k)-state partial agg, exact
    // counts from one hash agg, broadcast of the <= k sketch rows
    // back onto the vocabulary. ----
    QueryDef("q_sketch_heavy_hitters", Some(
      """WITH t AS (
        |  SELECT unnest(string_split(trim(text), ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok)
        |SELECT tok, cnt, TRUE AS underest_ok, TRUE AS err_within_bound
        |FROM c""".stripMargin))(
      (s, d) => {
        val k = 16
        val toks = Tables(s, d, "documents")
          .select(explode(split(trim(col("text")), " ")).as("tok"))
        val sk = toks.agg(GraftFunctions.misraGries(col("tok"), k).as("sk"))
          .select(explode(arrays_zip(col("sk.key"), col("sk.cnt"))).as("p"))
          .select(col("p.key").as("tok"), col("p.cnt").as("est"))
        val tot = toks.agg(count(lit(1)).as("tot"))
        toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(tot))
          .join(broadcast(sk), Seq("tok"), "left")
          .select(col("tok"), col("cnt"),
            (coalesce(col("est"), lit(0L)) <= col("cnt")).as("underest_ok"),
            ((col("cnt") - coalesce(col("est"), lit(0L))) * (k + 1)
              <= col("tot")).as("err_within_bound"))
      }),

    // ---- theta estimate WITH its error bound: KMV relative standard
    // error ≈ 1/sqrt(k−2); emit the ±2·RSE interval and whether the
    // exact count landed inside it — the self-auditing form a pipeline
    // should report. sqrt is IEEE-correctly-rounded (deterministic in
    // both engines), so even the bounds are exactly oracled. ----
    QueryDef("q_sketch_theta_ci", Some(
      s"""WITH h AS (
         |  SELECT DISTINCT o_orderpriority AS priority,
         |    ${h32Sql("CAST(o_custkey AS VARCHAR)")} AS h
         |  FROM orders
         |),
         |r AS (
         |  SELECT priority, h,
         |    row_number() OVER (PARTITION BY priority ORDER BY h) AS rn
         |  FROM h
         |),
         |agg AS (
         |  SELECT priority, count(*) AS exact_distinct,
         |    max(CASE WHEN rn = $k THEN h END) AS theta
         |  FROM r GROUP BY priority
         |),
         |est AS (
         |  SELECT priority, exact_distinct,
         |    CASE WHEN exact_distinct < $k THEN CAST(exact_distinct AS DOUBLE)
         |         ELSE ${k - 1} * $twoTo32 / theta END AS est_distinct,
         |    CASE WHEN exact_distinct < $k THEN 0.0
         |         ELSE 1.0 / sqrt(${k - 2}.0) END AS rse
         |  FROM agg)
         |SELECT priority, exact_distinct, est_distinct, rse,
         |  est_distinct * (1.0 - 2.0 * rse) AS ci_lo,
         |  est_distinct * (1.0 + 2.0 * rse) AS ci_hi,
         |  exact_distinct >= est_distinct * (1.0 - 2.0 * rse)
         |    AND exact_distinct <= est_distinct * (1.0 + 2.0 * rse) AS exact_in_ci
         |FROM est""".stripMargin))(
      (s, d) => {
        val sk = Tables(s, d, "orders")
          .select(col("o_orderpriority").as("priority"),
            h32(col("o_custkey").cast("string")).as("h"))
          .groupBy(col("priority"))
          .agg(GraftFunctions.kmv(col("h"), k).as("sketch"),
            countDistinct(col("h")).as("exact_distinct"))
        val est = sk.select(col("priority"), col("exact_distinct"),
          when(size(col("sketch")) < k, col("exact_distinct").cast("double"))
            .otherwise(lit((k - 1) * twoTo32) / element_at(col("sketch"), k))
            .as("est_distinct"),
          when(size(col("sketch")) < k, lit(0.0))
            .otherwise(lit(1.0) / sqrt(lit((k - 2).toDouble))).as("rse"))
        est.select(col("priority"), col("exact_distinct"), col("est_distinct"),
          col("rse"),
          (col("est_distinct") * (lit(1.0) - lit(2.0) * col("rse"))).as("ci_lo"),
          (col("est_distinct") * (lit(1.0) + lit(2.0) * col("rse"))).as("ci_hi"),
          (col("exact_distinct") >= col("est_distinct") * (lit(1.0) - lit(2.0) * col("rse")) &&
            col("exact_distinct") <= col("est_distinct") * (lit(1.0) + lit(2.0) * col("rse")))
            .as("exact_in_ci"))
      }),

    // ---- jackknife (leave-one-out) variance of the KMV estimate: a
    // DATA-DRIVEN error bar, complementing q_sketch_theta_ci's analytic
    // 1/√(k−2) RSE. Dropping retained hash i from a full sketch leaves
    // the estimate (k−2)·2³²/h_k for every i<k (h_k still the k-th
    // order statistic) and (k−2)·2³²/h_{k−1} for i=k — so the k
    // replicates take exactly TWO values and the jackknife variance
    // Var = (k−1)/k · Σ(est_i − mean)² collapses to a closed form over
    // (h_{k−1}, h_k). Every step is one fixed double-op tree over
    // exact integers — bit-identical cross-engine. ----
    QueryDef("q_sketch_kmv_jackknife", Some(
      s"""WITH h AS (
         |  SELECT DISTINCT o_orderpriority AS priority,
         |    ${h32Sql("CAST(o_custkey AS VARCHAR)")} AS h
         |  FROM orders
         |),
         |r AS (
         |  SELECT priority, h,
         |    row_number() OVER (PARTITION BY priority ORDER BY h) AS rn
         |  FROM h
         |),
         |agg AS (
         |  SELECT priority, count(*) AS exact_distinct,
         |    max(CASE WHEN rn = $k THEN h END) AS hk,
         |    max(CASE WHEN rn = ${k - 1} THEN h END) AS hk1
         |  FROM r GROUP BY priority
         |),
         |jk AS (
         |  SELECT priority, exact_distinct,
         |    CASE WHEN exact_distinct < $k THEN CAST(exact_distinct AS DOUBLE)
         |         ELSE ${k - 1}.0 * $twoTo32 / hk END AS est_distinct,
         |    ${k - 2}.0 * $twoTo32 / hk AS e1,
         |    ${k - 2}.0 * $twoTo32 / hk1 AS e2
         |  FROM agg)
         |SELECT priority, exact_distinct, est_distinct,
         |  CASE WHEN exact_distinct < $k THEN 0.0 ELSE
         |    ${k - 1}.0 / $k.0 *
         |      (${k - 1}.0 * (e1 - (${k - 1}.0 * e1 + e2) / $k.0)
         |                  * (e1 - (${k - 1}.0 * e1 + e2) / $k.0)
         |       + (e2 - (${k - 1}.0 * e1 + e2) / $k.0)
         |       * (e2 - (${k - 1}.0 * e1 + e2) / $k.0))
         |  END AS var_jk,
         |  CASE WHEN exact_distinct < $k THEN 0.0 ELSE
         |    sqrt(${k - 1}.0 / $k.0 *
         |      (${k - 1}.0 * (e1 - (${k - 1}.0 * e1 + e2) / $k.0)
         |                  * (e1 - (${k - 1}.0 * e1 + e2) / $k.0)
         |       + (e2 - (${k - 1}.0 * e1 + e2) / $k.0)
         |       * (e2 - (${k - 1}.0 * e1 + e2) / $k.0)))
         |  END AS se_jk
         |FROM jk""".stripMargin))(
      (s, d) => {
        val sk = Tables(s, d, "orders")
          .select(col("o_orderpriority").as("priority"),
            h32(col("o_custkey").cast("string")).as("h"))
          .groupBy(col("priority"))
          .agg(GraftFunctions.kmv(col("h"), k).as("sketch"),
            countDistinct(col("h")).as("exact_distinct"))
        val full = size(col("sketch")) === k
        val jk = sk.select(col("priority"), col("exact_distinct"),
          when(!full, col("exact_distinct").cast("double"))
            .otherwise(lit((k - 1).toDouble * twoTo32) / element_at(col("sketch"), k))
            .as("est_distinct"),
          (lit((k - 2).toDouble * twoTo32) / element_at(col("sketch"), k)).as("e1"),
          (lit((k - 2).toDouble * twoTo32) / element_at(col("sketch"), k - 1)).as("e2"),
          full.as("is_full"))
        // mean/variance spelled as ONE fixed expression tree (matching
        // the oracle literally) so the doubles agree bitwise
        val m = (lit((k - 1).toDouble) * col("e1") + col("e2")) / lit(k.toDouble)
        val varJk = lit((k - 1).toDouble) / lit(k.toDouble) *
          (lit((k - 1).toDouble) * (col("e1") - m) * (col("e1") - m) +
            (col("e2") - m) * (col("e2") - m))
        jk.select(col("priority"), col("exact_distinct"), col("est_distinct"),
          when(!col("is_full"), lit(0.0)).otherwise(varJk).as("var_jk"),
          when(!col("is_full"), lit(0.0)).otherwise(sqrt(varJk)).as("se_jk"))
      }),

    // ---- sketch MERGEABILITY — the property that makes KMV a
    // distributed-aggregation citizen: the k smallest distinct hashes
    // of a UNION of sketches form exactly the union's own sketch
    // (every one of the union's k smallest is within its home set's k
    // smallest, hence retained there). Per-group sketches built
    // independently merge into the global sketch with NO access to the
    // raw data — partial aggregation in miniature, pinned by comparing
    // against the sketch built directly over everything. ----
    QueryDef("q_sketch_theta_merge", Some(
      s"""WITH h AS (
         |  SELECT DISTINCT o_orderpriority AS priority,
         |    ${h32Sql("CAST(o_custkey AS VARCHAR)")} AS h
         |  FROM orders
         |),
         |r AS (
         |  SELECT priority, h,
         |    row_number() OVER (PARTITION BY priority ORDER BY h) AS rn
         |  FROM h
         |),
         |merged AS (
         |  SELECT h, row_number() OVER (ORDER BY h) AS rn
         |  FROM (SELECT DISTINCT h FROM r WHERE rn <= $k)
         |),
         |direct AS (
         |  SELECT h, row_number() OVER (ORDER BY h) AS rn
         |  FROM (SELECT DISTINCT h FROM h)
         |)
         |SELECT
         |  (SELECT max(CASE WHEN rn = $k THEN h END) FROM merged) AS theta_merged,
         |  (SELECT max(CASE WHEN rn = $k THEN h END) FROM direct) AS theta_direct,
         |  ${k - 1}.0 * $twoTo32
         |    / (SELECT max(CASE WHEN rn = $k THEN h END) FROM merged) AS est_merged,
         |  (SELECT count(DISTINCT h) FROM h) AS exact_distinct""".stripMargin))(
      (s, d) => {
        val hashed = Tables(s, d, "orders")
          .select(col("o_orderpriority").as("priority"),
            h32(col("o_custkey").cast("string")).as("h"))
          .persist()
        // independent per-group sketches ...
        val perGroup = hashed.groupBy(col("priority"))
          .agg(GraftFunctions.kmv(col("h"), k).as("sk"))
        // ... merged WITHOUT the raw data: re-sketch the union of the
        // retained hashes (k smallest distinct of the concatenation)
        val merged = perGroup
          .select(explode(col("sk")).as("h"))
          .agg(GraftFunctions.kmv(col("h"), k).as("sk"))
          .select(element_at(col("sk"), k).as("theta_merged"))
        val direct = hashed
          .agg(GraftFunctions.kmv(col("h"), k).as("sk"),
            countDistinct(col("h")).as("exact_distinct"))
          .select(element_at(col("sk"), k).as("theta_direct"),
            col("exact_distinct"))
        merged.crossJoin(direct)
          .select(col("theta_merged"), col("theta_direct"),
            (lit((k - 1).toDouble * twoTo32) / col("theta_merged")).as("est_merged"),
            col("exact_distinct"))
      }),

    // ---- sliding-window distinct via sketch merge: trailing 7-day
    // distinct users per day, from PER-DAY sketches only. The exact
    // version must re-touch every (user, day∈window) pair — 7× the
    // data per window step, the thing that makes sliding distincts
    // infamous at scale; the sketch version stores k longs per day
    // and merges 7 sketches per window (mergeability pinned by
    // q_sketch_theta_merge). Each daily sketch replicates to the ≤7
    // windows it serves via a bounded explode — never the raw events.
    // The exact column is the fixture-scale audit riding the oracle;
    // at 100 TB only the sketch path runs. ----
    QueryDef("q_sketch_sliding_distinct", Some(
      s"""WITH e AS (
         |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
         |    ${h32Sql("CAST(user_id AS VARCHAR)")} AS h
         |  FROM events),
         |days AS (SELECT DISTINCT day FROM e),
         |r AS (SELECT day, h,
         |    row_number() OVER (PARTITION BY day ORDER BY h) AS rn
         |  FROM e),
         |dsk AS (SELECT day, h FROM r WHERE rn <= $k),
         |u AS (
         |  SELECT target, h, row_number() OVER (PARTITION BY target
         |      ORDER BY h) AS rn
         |  FROM (SELECT DISTINCT d.day AS target, s.h
         |        FROM days d JOIN dsk s ON s.day BETWEEN d.day - 6 AND d.day)),
         |win AS (
         |  SELECT target AS day, count(*) FILTER (WHERE rn <= $k) AS m,
         |    max(CASE WHEN rn = $k THEN h END) AS theta
         |  FROM u GROUP BY target),
         |ex AS (
         |  SELECT d.day, count(DISTINCT e2.h) AS exact7
         |  FROM days d JOIN e e2 ON e2.day BETWEEN d.day - 6 AND d.day
         |  GROUP BY d.day)
         |SELECT win.day, ex.exact7, coalesce(win.theta, -1) AS theta,
         |  CASE WHEN win.m < $k THEN CAST(win.m AS DOUBLE)
         |       ELSE ${k - 1} * $twoTo32 / win.theta END AS est7
         |FROM win JOIN ex ON ex.day = win.day""".stripMargin))(
      (s, d) => {
        val e = Tables(s, d, "events")
          .select(expr("unix_micros(ts) DIV 86400000000").as("day"),
            h32(col("user_id").cast("string")).as("h"))
          .distinct()
          .persist() // daily sketches AND the exact audit read this
        val daily = e.groupBy(col("day"))
          .agg(GraftFunctions.kmv(col("h"), k).as("sk"))
        val days = daily.select(col("day").as("target"))
        val win = daily
          .select(col("day"), explode(col("sk")).as("h"))
          .withColumn("target", explode(sequence(col("day"), col("day") + 6)))
          .join(days, Seq("target"), "left_semi")
          .groupBy(col("target").as("day"))
          .agg(GraftFunctions.kmv(col("h"), k).as("sk"))
          .select(col("day"),
            coalesce(when(size(col("sk")) === k, element_at(col("sk"), k)),
              lit(-1L)).as("theta"),
            when(size(col("sk")) < k, size(col("sk")).cast("double"))
              .otherwise(lit((k - 1) * twoTo32) / element_at(col("sk"), k))
              .as("est7"))
        val exact = e
          .withColumn("target", explode(sequence(col("day"), col("day") + 6)))
          .join(days, Seq("target"), "left_semi")
          .groupBy(col("target").as("day"))
          .agg(countDistinct(col("h")).as("exact7"))
        win.join(exact, "day")
          .select(col("day"), col("exact7"), col("theta"), col("est7"))
      }),

    // ---- join-size estimation from count-min sketches (the AGMS /
    // CM inner-product estimator: |A ⋈_k B| = Σ_k d_A(k)·d_B(k) ≈
    // min_r Σ_b cmA[r][b]·cmB[r][b]) — the statistic a planner needs
    // BEFORE choosing a join strategy. Each side is summarized into
    // depth×width = 4×256 integer counters regardless of key
    // cardinality; the estimate per hash row is the bucket-vector
    // inner product, a one-sided OVER-estimate (hash collisions only
    // add cross terms), and min across the 4 independent rows is the
    // estimator. The exact degree-histogram join pins the bound:
    // est_r ≥ exact for every r. Scale: exact join-size needs a
    // |distinct keys|-row histogram per side; the sketch shuffles
    // 1024 cells per side TOTAL (partial-agg combine), so the
    // estimate costs one scan per side and O(1) memory at 100 TB. ----
    QueryDef("q_sketch_join_size", Some {
      val width = 256; val depth = 4
      s"""WITH c AS (SELECT CAST(user_id AS VARCHAR) AS u FROM events
         |           WHERE event_type = 'click'),
         |v AS (SELECT CAST(user_id AS VARCHAR) AS u FROM events
         |      WHERE event_type = 'view'),
         |rws AS (SELECT r FROM range(0, $depth) t(r)),
         |cc AS (SELECT rws.r AS r,
         |    ${h32Sql(s"u || '#' || CAST(rws.r AS VARCHAR)")} % $width AS b,
         |    count(*) AS n
         |  FROM c, rws GROUP BY 1, 2),
         |vv AS (SELECT rws.r AS r,
         |    ${h32Sql(s"u || '#' || CAST(rws.r AS VARCHAR)")} % $width AS b,
         |    count(*) AS n
         |  FROM v, rws GROUP BY 1, 2),
         |est AS (SELECT cc.r AS r, CAST(sum(cc.n * vv.n) AS BIGINT) AS est_r
         |  FROM cc JOIN vv ON cc.r = vv.r AND cc.b = vv.b GROUP BY cc.r),
         |ex AS (SELECT CAST(sum(dc.n * dv.n) AS BIGINT) AS exact
         |  FROM (SELECT u, count(*) AS n FROM c GROUP BY u) dc
         |  JOIN (SELECT u, count(*) AS n FROM v GROUP BY u) dv
         |    ON dc.u = dv.u)
         |SELECT est.r, est.est_r, ex.exact FROM est CROSS JOIN ex"""
        .stripMargin
    })(
      (s, d) => {
        val width = 256L; val depth = 4L
        val ev = Tables(s, d, "events")
        def side(t: String) = ev.where(col("event_type") === t)
          .select(col("user_id").cast("string").as("u"))
        def cm(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("r", explode(sequence(lit(0L), lit(depth - 1))))
          .select(col("r"),
            (h32(concat(col("u"), lit("#"), col("r").cast("string")))
              % width).as("b"))
          .groupBy(col("r"), col("b")).agg(count(lit(1)).as("n"))
        val c = side("click"); val v = side("view")
        val est = cm(c).as("cc")
          .join(cm(v).as("vv"), Seq("r", "b"))
          .groupBy(col("r"))
          .agg(sum(col("cc.n") * col("vv.n")).as("est_r"))
        val exact = c.groupBy(col("u")).agg(count(lit(1)).as("nc"))
          .join(v.groupBy(col("u")).agg(count(lit(1)).as("nv")), "u")
          .agg(sum(col("nc") * col("nv")).as("exact"))
        est.crossJoin(broadcast(exact))
          .select(col("r"), col("est_r"), col("exact"))
      })
  )
}
