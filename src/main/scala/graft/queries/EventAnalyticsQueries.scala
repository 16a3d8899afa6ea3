package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics operators over the `events` fixture (north-star
  * extension): ordered funnels, cohort retention, and gap-filled
  * resampling — the product-analytics surface a warehouse user expects
  * on top of the relational core. All time arithmetic is integer
  * epoch-micros (`unix_micros` / `epoch_us`), so the oracles share
  * exact arithmetic with Spark instead of dialect date functions.
  */
object EventAnalyticsQueries {

  private val usPerDay = 86400000000L

  /** Wilson 95% interval bound over integer columns (wa, wb, wd):
    * z = 1.96 = 49/25 EXACTLY, so the whole interval clears to
    *   (A ± 98·sqrt(D)) / B  with
    *   A = (2500k + 4802)·n, B = n·(2500n + 9604),
    *   D = 2500·n·k·(n−k) + 2401·n²  — all exact integers.
    * The double tail is then four individually-rounded binary64 ops
    * (sqrt, ×98, ±, ÷) with INTEGER constants only. (The first cut
    * used decimal literals like 0.9604 — both engines type those as
    * DECIMAL and their division scale rules differ, which cost a ULP:
    * never put a non-integer literal inside a parity-critical double
    * chain.) `sign` is "-" (lower) or "+" (upper). */
  private def wilsonSql(tag: String, sign: String): String =
    s"((CAST(wa AS DOUBLE) $sign 98 * sqrt(CAST(wd AS DOUBLE)))" +
      " / CAST(wb AS DOUBLE))"

  val defs: Seq[QueryDef] = Seq(

    // ---- ordered funnel view → click → purchase: each step's
    // timestamp must STRICTLY follow the previous step's. Two equi-
    // joins on user_id (each side pre-aggregated to one row per user,
    // so the join input is |users|, not |events| — the scale shape);
    // no window over the full event stream. ----
    QueryDef("q_events_funnel", Some(
      s"""WITH e AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
         |v AS (
         |  SELECT user_id, min(tus) AS t1 FROM e
         |  WHERE event_type = 'view' GROUP BY user_id),
         |c AS (
         |  SELECT e.user_id, min(e.tus) AS t2
         |  FROM e JOIN v ON e.user_id = v.user_id
         |  WHERE e.event_type = 'click' AND e.tus > v.t1
         |  GROUP BY e.user_id),
         |p AS (
         |  SELECT e.user_id, min(e.tus) AS t3
         |  FROM e JOIN c ON e.user_id = c.user_id
         |  WHERE e.event_type = 'purchase' AND e.tus > c.t2
         |  GROUP BY e.user_id)
         |SELECT (SELECT count(*) FROM v) AS n_view,
         |  (SELECT count(*) FROM c) AS n_click_after_view,
         |  (SELECT count(*) FROM p) AS n_purchase_after_click""".stripMargin))(
      (s, d) => {
        val e = Tables(s, d, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("tus"))
        val v = e.where(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("tus")).as("t1"))
        val c = e.where(col("event_type") === "click")
          .join(v, "user_id").where(col("tus") > col("t1"))
          .groupBy(col("user_id")).agg(min(col("tus")).as("t2"))
        val p = e.where(col("event_type") === "purchase")
          .join(c, "user_id").where(col("tus") > col("t2"))
          .groupBy(col("user_id")).agg(min(col("tus")).as("t3"))
        v.agg(count(lit(1)).as("n_view"))
          .crossJoin(c.agg(count(lit(1)).as("n_click_after_view")))
          .crossJoin(p.agg(count(lit(1)).as("n_purchase_after_click")))
      }),

    // ---- cohort retention: users cohorted by first-signup DAY
    // (epoch-day integer), counted distinct per (cohort, day-offset)
    // for offsets 0..6. Day buckets are integer division on micros —
    // identical in both engines, no calendar functions. ----
    QueryDef("q_events_retention", Some(
      s"""WITH e AS (
         |  SELECT user_id, event_type,
         |    epoch_us(ts) // $usPerDay AS day FROM events),
         |cohort AS (
         |  SELECT user_id, min(day) AS cohort_day FROM e
         |  WHERE event_type = 'signup' GROUP BY user_id),
         |activity AS (SELECT DISTINCT user_id, day FROM e)
         |SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
         |  count(DISTINCT a.user_id) AS n_users
         |FROM activity a JOIN cohort c ON a.user_id = c.user_id
         |WHERE a.day - c.cohort_day BETWEEN 0 AND 6
         |GROUP BY c.cohort_day, a.day - c.cohort_day""".stripMargin))(
      (s, d) => {
        val e = Tables(s, d, "events")
          .select(col("user_id"), col("event_type"),
            expr(s"unix_micros(ts) DIV $usPerDay").as("day"))
        val cohort = e.where(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
        val activity = e.select(col("user_id"), col("day")).distinct()
        activity.join(cohort, "user_id")
          .withColumn("day_offset", col("day") - col("cohort_day"))
          .where(col("day_offset").between(0, 6))
          .groupBy(col("cohort_day"), col("day_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
      }),

    // ---- gap-filled resample with last-observation-carried-forward:
    // per event type, 6-hour bins over the fixture month from a
    // GENERATED dense grid (sequence/range — never a scan), left-join
    // the actual bin aggregates, then fill empty bins with the last
    // non-null average (IGNORE NULLS window). Value sums go through
    // floor(v·100+0.5) cents (integral doubles sum exactly in any
    // order — the engine's money-parity rule). The per-type window is
    // tiny (|bins|), so the fill stage never sees raw events. ----
    QueryDef("q_events_resample_locf", Some {
      val start = 1704067200000000L // 2024-01-01T00:00:00Z
      val end = 1706745600000000L   // 2024-02-01T00:00:00Z
      val step = 21600000000L       // 6 h
      s"""WITH grid AS (
         |  SELECT t.event_type, b.bin_start
         |  FROM (SELECT DISTINCT event_type FROM events) t,
         |    (SELECT unnest(range($start, $end, $step)) AS bin_start) b),
         |agg AS (
         |  SELECT event_type,
         |    epoch_us(ts) - epoch_us(ts) % $step AS bin_start,
         |    count(*) AS n,
         |    sum(floor(value * 100 + 0.5)) / 100.0 AS total_value
         |  FROM events GROUP BY 1, 2)
         |SELECT g.event_type, g.bin_start,
         |  coalesce(a.n, 0) AS n_events,
         |  a.total_value AS raw_value,
         |  coalesce(a.total_value, last_value(a.total_value IGNORE NULLS)
         |    OVER (PARTITION BY g.event_type ORDER BY g.bin_start
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         |    AS locf_value
         |FROM grid g LEFT JOIN agg a
         |  ON g.event_type = a.event_type AND g.bin_start = a.bin_start""".stripMargin
    })(
      (s, d) => {
        val start = 1704067200000000L
        val end = 1706745600000000L
        val step = 21600000000L
        val types = Tables(s, d, "events").select(col("event_type")).distinct()
        val grid = types.withColumn("bin_start",
          explode(sequence(lit(start), lit(end - 1), lit(step))))
        val agg = Tables(s, d, "events")
          .select(col("event_type"),
            (unix_micros(col("ts")) - unix_micros(col("ts")) % step).as("bin_start"),
            col("value"))
          .groupBy(col("event_type"), col("bin_start"))
          .agg(count(lit(1)).as("n"),
            (sum(floor(col("value") * 100 + 0.5)) / 100.0).as("total_value"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("bin_start"))
          .rowsBetween(Window.unboundedPreceding, -1)
        grid.join(agg, Seq("event_type", "bin_start"), "left")
          .select(col("event_type"), col("bin_start"),
            coalesce(col("n"), lit(0L)).as("n_events"),
            col("total_value").as("raw_value"),
            coalesce(col("total_value"),
              last(col("total_value"), ignoreNulls = true).over(w))
              .as("locf_value"))
      }),

    // ---- LINEAR-interpolation resample (the gap-filling twin of
    // q_events_resample_locf, same 6 h grid): an empty bin gets
    // pv + (nv − pv)·(t − pt)/(nt − pt) between its nearest non-empty
    // neighbors; leading/trailing gaps stay NULL (no extrapolation).
    // Four IGNORE NULLS window lookups fetch the neighbor (value, bin)
    // pairs in one pass per direction over the same per-type sort the
    // LOCF uses; bin arithmetic is exact int64 and the interpolation
    // is a fixed three-op double tree over engine-identical inputs, so
    // the filled series oracles bitwise. Scale: grid is types × bins
    // (bounded), everything windows inside the event_type partition —
    // one shuffle, no global sort. ----
    QueryDef("q_events_interpolate", Some {
      val start = 1704067200000000L // 2024-01-01T00:00:00Z
      val end = 1706745600000000L   // 2024-02-01T00:00:00Z
      val step = 21600000000L       // 6 h
      s"""WITH grid AS (
         |  SELECT t.event_type, b.bin_start
         |  FROM (SELECT DISTINCT event_type FROM events) t,
         |    (SELECT unnest(range($start, $end, $step)) AS bin_start) b),
         |agg AS (
         |  SELECT event_type,
         |    epoch_us(ts) - epoch_us(ts) % $step AS bin_start,
         |    count(*) AS n,
         |    sum(floor(value * 100 + 0.5)) / 100.0 AS total_value
         |  FROM events GROUP BY 1, 2),
         |j AS (
         |  SELECT g.event_type, g.bin_start,
         |    coalesce(a.n, 0) AS n_events, a.total_value AS raw_value
         |  FROM grid g LEFT JOIN agg a
         |    ON g.event_type = a.event_type AND g.bin_start = a.bin_start),
         |x AS (
         |  SELECT *,
         |    last_value(raw_value IGNORE NULLS) OVER wp AS pv,
         |    last_value(CASE WHEN raw_value IS NOT NULL THEN bin_start END
         |      IGNORE NULLS) OVER wp AS pt,
         |    first_value(raw_value IGNORE NULLS) OVER wn AS nv,
         |    first_value(CASE WHEN raw_value IS NOT NULL THEN bin_start END
         |      IGNORE NULLS) OVER wn AS nt
         |  FROM j
         |  WINDOW wp AS (PARTITION BY event_type ORDER BY bin_start
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |  wn AS (PARTITION BY event_type ORDER BY bin_start
         |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
         |SELECT event_type, bin_start, n_events, raw_value,
         |  coalesce(raw_value,
         |    pv + (nv - pv) * (CAST(bin_start - pt AS DOUBLE)
         |                      / CAST(nt - pt AS DOUBLE))) AS interp_value
         |FROM x""".stripMargin
    })(
      (s, d) => {
        val start = 1704067200000000L
        val end = 1706745600000000L
        val step = 21600000000L
        val types = Tables(s, d, "events").select(col("event_type")).distinct()
        val grid = types.withColumn("bin_start",
          explode(sequence(lit(start), lit(end - 1), lit(step))))
        val agg = Tables(s, d, "events")
          .select(col("event_type"),
            (unix_micros(col("ts")) - unix_micros(col("ts")) % step).as("bin_start"),
            col("value"))
          .groupBy(col("event_type"), col("bin_start"))
          .agg(count(lit(1)).as("n"),
            (sum(floor(col("value") * 100 + 0.5)) / 100.0).as("total_value"))
        val wp = Window.partitionBy(col("event_type")).orderBy(col("bin_start"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wn = Window.partitionBy(col("event_type")).orderBy(col("bin_start"))
          .rowsBetween(1, Window.unboundedFollowing)
        val markedBin = when(col("raw_value").isNotNull, col("bin_start"))
        grid.join(agg, Seq("event_type", "bin_start"), "left")
          .select(col("event_type"), col("bin_start"),
            coalesce(col("n"), lit(0L)).as("n_events"),
            col("total_value").as("raw_value"))
          .select(col("event_type"), col("bin_start"), col("n_events"),
            col("raw_value"),
            last(col("raw_value"), ignoreNulls = true).over(wp).as("pv"),
            last(markedBin, ignoreNulls = true).over(wp).as("pt"),
            first(col("raw_value"), ignoreNulls = true).over(wn).as("nv"),
            first(markedBin, ignoreNulls = true).over(wn).as("nt"))
          .select(col("event_type"), col("bin_start"), col("n_events"),
            col("raw_value"),
            coalesce(col("raw_value"),
              col("pv") + (col("nv") - col("pv"))
                * ((col("bin_start") - col("pt")).cast("double")
                   / (col("nt") - col("pt")).cast("double")))
              .as("interp_value"))
      }),

    // ---- per-bin anomaly flags (pipeline monitoring): daily value
    // totals per event type z-scored against that type's own
    // distribution. Moments are exact integer sums over cents (the
    // covar pattern — order-independent, overflow-safe at these
    // magnitudes), so mean/std/z are one fixed double-op tree and the
    // flags oracle exactly. The per-type moment aggregate is 2 values
    // per type regardless of bin count — constant state. ----
    QueryDef("q_events_anomaly", Some(
      s"""WITH b AS (
         |  SELECT event_type, epoch_us(ts) // $usPerDay AS day,
         |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
         |  FROM events GROUP BY 1, 2),
         |m AS (
         |  SELECT event_type, count(*) AS nb,
         |    CAST(sum(cents) AS HUGEINT) AS sx,
         |    sum(CAST(cents AS HUGEINT) * cents) AS sxx
         |  FROM b GROUP BY event_type)
         |SELECT b.event_type, b.day, b.cents / 100.0 AS day_value,
         |  (CAST(b.cents AS DOUBLE) - CAST(m.sx AS DOUBLE) / m.nb)
         |    / sqrt(CAST(m.nb * m.sxx - m.sx * m.sx AS DOUBLE) / m.nb / m.nb)
         |    AS zscore,
         |  abs((CAST(b.cents AS DOUBLE) - CAST(m.sx AS DOUBLE) / m.nb)
         |    / sqrt(CAST(m.nb * m.sxx - m.sx * m.sx AS DOUBLE) / m.nb / m.nb))
         |    > 2.0 AS is_anomaly
         |FROM b JOIN m ON b.event_type = m.event_type""".stripMargin))(
      (s, d) => {
        val b = Tables(s, d, "events")
          .select(col("event_type"),
            expr(s"unix_micros(ts) DIV $usPerDay").as("day"),
            floor(col("value") * 100 + 0.5).cast("bigint").as("c"))
          .groupBy(col("event_type"), col("day"))
          .agg(sum(col("c")).as("cents"))
        // moments in decimal(38,0)/HUGEINT: Σcents² wraps int64 once
        // daily totals pass ~3e9 cents (the OLS-entry precedent)
        val m = b.groupBy(col("event_type"))
          .agg(count(lit(1)).as("nb"),
            sum(col("cents").cast("decimal(38,0)")).as("sx"),
            sum(col("cents").cast("decimal(38,0)") * col("cents")).as("sxx"))
        val z = (col("cents").cast("double") - col("sx").cast("double") / col("nb")) /
          sqrt((col("nb") * col("sxx") - col("sx") * col("sx")).cast("double")
            / col("nb") / col("nb"))
        b.join(m, "event_type")
          .select(col("event_type"), col("day"),
            (col("cents") / 100.0).as("day_value"),
            z.as("zscore"), (abs(z) > 2.0).as("is_anomaly"))
      }),

    // ---- ROBUST anomaly flags: median/MAD instead of mean/std — one
    // wild day cannot drag the baseline the way it drags a mean, the
    // standard robust-monitoring upgrade. Medians are LOWER medians
    // picked by row_number at position (n+1)/2 (no FP interpolation —
    // Spark's percentile() interpolates and DuckDB's quantile_disc
    // doesn't, so rank-picking is the only bit-identical route), and
    // daily cents are integers, so median, MAD and the 3·MAD compare
    // are all exact integer arithmetic. Scale: both median passes run
    // over the DAILY AGGREGATE (days × types rows), never the raw
    // events — same shape as the mean/std variant. ----
    QueryDef("q_events_anomaly_robust", Some(
      s"""WITH b AS (
         |  SELECT event_type, epoch_us(ts) // $usPerDay AS day,
         |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
         |  FROM events GROUP BY 1, 2),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY event_type
         |      ORDER BY cents, day) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS nb
         |  FROM b),
         |med AS (
         |  SELECT event_type, cents AS med FROM r WHERE rn = (nb + 1) // 2),
         |dev AS (
         |  SELECT b.event_type, b.day, b.cents, med.med,
         |    abs(b.cents - med.med) AS ad,
         |    row_number() OVER (PARTITION BY b.event_type
         |      ORDER BY abs(b.cents - med.med), b.day) AS rn,
         |    count(*) OVER (PARTITION BY b.event_type) AS nb
         |  FROM b JOIN med ON med.event_type = b.event_type),
         |mad AS (
         |  SELECT event_type, ad AS mad FROM dev WHERE rn = (nb + 1) // 2)
         |SELECT dev.event_type, dev.day, dev.cents / 100.0 AS day_value,
         |  dev.med / 100.0 AS med_value, mad.mad / 100.0 AS mad_value,
         |  dev.ad > 3 * mad.mad AS is_anomaly
         |FROM dev JOIN mad ON mad.event_type = dev.event_type""".stripMargin))(
      (s, d) => {
        val b = Tables(s, d, "events")
          .select(col("event_type"),
            expr(s"unix_micros(ts) DIV $usPerDay").as("day"),
            floor(col("value") * 100 + 0.5).cast("bigint").as("c"))
          .groupBy(col("event_type"), col("day"))
          .agg(sum(col("c")).as("cents"))
          .persist() // two median passes + the final projection
        val wType = Window.partitionBy(col("event_type"))
        def lowerMedian(df: org.apache.spark.sql.DataFrame, value: Column,
            out: String) =
          df.withColumn("rn", row_number().over(wType.orderBy(value, col("day"))))
            .withColumn("nb", count(lit(1)).over(wType))
            .where(col("rn") === expr("(nb + 1) DIV 2"))
            .select(col("event_type"), value.as(out))
        val med = lowerMedian(b, col("cents"), "med")
        val dev = b.join(med, "event_type")
          .withColumn("ad", abs(col("cents") - col("med")))
        val mad = lowerMedian(dev, col("ad"), "mad")
        dev.join(mad, "event_type")
          .select(col("event_type"), col("day"),
            (col("cents") / 100.0).as("day_value"),
            (col("med") / 100.0).as("med_value"),
            (col("mad") / 100.0).as("mad_value"),
            (col("ad") > lit(3) * col("mad")).as("is_anomaly"))
      }),

    // ---- event-type transition matrix (first-order Markov counts):
    // per user, events ordered by time give (prev_type → type) bigrams;
    // the global count per ordered pair is the transition matrix every
    // journey/path analysis starts from. A user's first event counts
    // as a '<start>' transition, so row sums equal per-type event
    // totals. Order within a user is (ts, event_id) — event_id breaks
    // same-microsecond ties deterministically. Scale: ONE shuffle on
    // user_id for the lag window (each user's history sorts
    // independently), then a pre-aggregated-by-pair shuffle whose
    // cardinality is |types|², not |events|. ----
    QueryDef("q_events_transitions", Some(
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_type
        |  FROM events)
        |SELECT coalesce(prev_type, '<start>') AS prev_type,
        |  event_type AS next_type,
        |  CAST(count(*) AS BIGINT) AS n_transitions,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM s GROUP BY 1, 2""".stripMargin))(
      (s, d) => {
        val wUser = Window.partitionBy(col("user_id"))
          .orderBy(unix_micros(col("ts")), col("event_id"))
        Tables(s, d, "events")
          .select(col("user_id"), col("event_type"),
            lag(col("event_type"), 1).over(wUser).as("prev"))
          .groupBy(coalesce(col("prev"), lit("<start>")).as("prev_type"),
            col("event_type").as("next_type"))
          .agg(count(lit(1)).as("n_transitions"),
            countDistinct(col("user_id")).as("n_users"))
      }),

    // ---- time-weighted average value per user (TWAP): each reading
    // holds until the next one, so it weighs by its interval length.
    // dt comes from one per-user lead() window; weights are integer
    // micros × integer cents — per-row products fit int64, the SUMS
    // accumulate in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), both
    // exact, with ONE final cast-to-double division pair — the same
    // wrap-proof arithmetic as q_agg_covar_exact. Scale: the lead
    // window and the groupBy share the user_id partitioning (one
    // shuffle total), per-user state is a constant accumulator. ----
    QueryDef("q_events_twap", Some(
      """WITH s AS (
        |  SELECT user_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) - epoch_us(ts) AS dt
        |  FROM events),
        |m AS (
        |  SELECT user_id, count(*) AS n_intervals,
        |    CAST(sum(dt) AS BIGINT) AS span_us,
        |    sum(cents * dt) AS wsum
        |  FROM s WHERE dt IS NOT NULL GROUP BY user_id)
        |SELECT user_id, n_intervals, span_us,
        |  CAST(wsum AS DOUBLE) / CAST(span_us AS DOUBLE) / 100.0 AS twap
        |FROM m WHERE span_us > 0""".stripMargin))(
      (s, d) => {
        val wUser = Window.partitionBy(col("user_id"))
          .orderBy(unix_micros(col("ts")), col("event_id"))
        Tables(s, d, "events")
          .select(col("user_id"),
            floor(col("value") * 100 + 0.5).cast("bigint").as("cents"),
            (lead(unix_micros(col("ts")), 1).over(wUser)
              - unix_micros(col("ts"))).as("dt"))
          .where(col("dt").isNotNull)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_intervals"),
            sum(col("dt")).as("span_us"),
            sum((col("cents") * col("dt")).cast("decimal(28,0)")).as("wsum"))
          .where(col("span_us") > 0)
          .select(col("user_id"), col("n_intervals"), col("span_us"),
            (col("wsum").cast("double") / col("span_us").cast("double")
              / lit(100.0)).as("twap"))
      }),

    // ---- A/B comparison (Welch's t): treatment 'click' vs control
    // 'view' event values, the experimentation-analytics primitive.
    // Group moments (n, Σx, Σx²) come from integer cents with
    // DECIMAL(38,0)/HUGEINT sums — exact at any group size — via ONE
    // conditional aggregate over the scan (no join, no second pass);
    // the t-statistic is then a fixed sequence of IEEE ops (+ the
    // allowed exact sqrt) on those exact moments, bit-identical in
    // both engines. Output includes the |t| > 1.96 verdict. ----
    QueryDef("q_events_ab_test", Some(
      """WITH s AS (
        |  SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events WHERE event_type IN ('click', 'view')),
        |m AS (
        |  SELECT
        |    count(CASE WHEN event_type = 'click' THEN 1 END) AS na,
        |    sum(CASE WHEN event_type = 'click' THEN c ELSE 0 END) AS sa,
        |    sum(CASE WHEN event_type = 'click' THEN c * c ELSE 0 END) AS qa,
        |    count(CASE WHEN event_type = 'view' THEN 1 END) AS nb,
        |    sum(CASE WHEN event_type = 'view' THEN c ELSE 0 END) AS sb,
        |    sum(CASE WHEN event_type = 'view' THEN c * c ELSE 0 END) AS qb
        |  FROM s)
        |SELECT na, nb,
        |  CAST(sa AS DOUBLE) / na / 100.0 AS mean_a,
        |  CAST(sb AS DOUBLE) / nb / 100.0 AS mean_b,
        |  (CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
        |    / sqrt(CAST(na * qa - sa * sa AS DOUBLE) / na / (na - 1) / na
        |         + CAST(nb * qb - sb * sb AS DOUBLE) / nb / (nb - 1) / nb)
        |    AS t_stat,
        |  abs((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
        |    / sqrt(CAST(na * qa - sa * sa AS DOUBLE) / na / (na - 1) / na
        |         + CAST(nb * qb - sb * sb AS DOUBLE) / nb / (nb - 1) / nb))
        |    > 1.96 AS significant
        |FROM m""".stripMargin))(
      (s, d) => {
        val c = floor(col("value") * 100 + 0.5).cast("bigint")
        def side(t: String, e: Column) = when(col("event_type") === t, e)
        val m = Tables(s, d, "events")
          .where(col("event_type").isin("click", "view"))
          .select(col("event_type"), c.as("c"))
          .agg(
            count(side("click", lit(1))).as("na"),
            sum(coalesce(side("click", col("c")), lit(0L))
              .cast("decimal(28,0)")).as("sa"),
            sum(coalesce(side("click", col("c") * col("c")), lit(0L))
              .cast("decimal(28,0)")).as("qa"),
            count(side("view", lit(1))).as("nb"),
            sum(coalesce(side("view", col("c")), lit(0L))
              .cast("decimal(28,0)")).as("sb"),
            sum(coalesce(side("view", col("c") * col("c")), lit(0L))
              .cast("decimal(28,0)")).as("qb"))
        val meanA = col("sa").cast("double") / col("na")
        val meanB = col("sb").cast("double") / col("nb")
        val se = sqrt(
          (col("na") * col("qa") - col("sa") * col("sa")).cast("double")
            / col("na") / (col("na") - 1) / col("na")
          + (col("nb") * col("qb") - col("sb") * col("sb")).cast("double")
            / col("nb") / (col("nb") - 1) / col("nb"))
        val t = (meanA - meanB) / se
        m.select(col("na"), col("nb"),
          (meanA / 100.0).as("mean_a"), (meanB / 100.0).as("mean_b"),
          t.as("t_stat"), (abs(t) > 1.96).as("significant"))
      }),

    // ---- chi-square independence audit: event type × day-of-week
    // contingency table, the categorical sibling of the Welch's t
    // entry (is traffic mix stable across weekdays, or does a segment
    // behave differently on weekends?). Day-of-week is pure integer
    // micros arithmetic (no calendar functions). The cell frame is
    // |types|×7 regardless of data size, so after ONE bounded partial
    // aggregate every remaining window runs over ≤ dozens of rows.
    // Per-cell χ² terms use the exact identity
    // (obs·N − R·C)² / (N·R·C): the numerator is an exact
    // HUGEINT/DECIMAL(38,0) integer (int64 would wrap at sf0.1), one
    // division per cell, then the scaled-sum parity pattern
    // (floor(x·1e9 + 0.5) integers) makes the global χ² an exact
    // integer sum no float ordering can perturb. ----
    QueryDef("q_events_chi_square", Some(
      s"""WITH e AS (
         |  SELECT event_type,
         |    ((epoch_us(ts) // $usPerDay) + 4) % 7 AS dow FROM events),
         |o AS (
         |  SELECT event_type, dow, count(*) AS obs FROM e
         |  GROUP BY event_type, dow),
         |t AS (
         |  SELECT event_type, dow, obs,
         |    CAST(sum(obs) OVER (PARTITION BY event_type) AS BIGINT) AS r,
         |    CAST(sum(obs) OVER (PARTITION BY dow) AS BIGINT) AS c,
         |    CAST(sum(obs) OVER () AS BIGINT) AS n
         |  FROM o),
         |x AS (
         |  SELECT event_type, dow, obs, r, c, n,
         |    CAST(floor(CAST(r * c AS DOUBLE) / n * 1000000 + 0.5) AS BIGINT)
         |      AS expected_e6,
         |    CAST(floor(
         |      CAST((CAST(obs AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
         |         * (CAST(obs AS HUGEINT) * n - CAST(r AS HUGEINT) * c) AS DOUBLE)
         |      / (CAST(n AS DOUBLE) * r * c) * 1000000000 + 0.5) AS BIGINT)
         |      AS contrib_e9
         |  FROM t)
         |SELECT event_type, CAST(dow AS BIGINT) AS dow, obs AS observed,
         |  expected_e6, contrib_e9,
         |  CAST(sum(contrib_e9) OVER () AS BIGINT) AS chi2_e9
         |FROM x""".stripMargin))(
      (s, d) => {
        val e = Tables(s, d, "events")
          .select(col("event_type"),
            ((expr(s"unix_micros(ts) DIV $usPerDay") + 4) % 7).as("dow"))
        val o = e.groupBy(col("event_type"), col("dow"))
          .agg(count(lit(1)).as("obs"))
        val t = o
          .withColumn("r",
            sum(col("obs")).over(Window.partitionBy(col("event_type"))))
          .withColumn("c",
            sum(col("obs")).over(Window.partitionBy(col("dow"))))
          .withColumn("n", sum(col("obs")).over(graft.ops.BoundedWindow.all()))
        val dev = col("obs").cast("decimal(38,0)") * col("n") -
          col("r").cast("decimal(38,0)") * col("c")
        val x = t
          .withColumn("expected_e6",
            floor((col("r") * col("c")).cast("double") / col("n")
              * 1000000 + 0.5).cast("bigint"))
          .withColumn("contrib_e9",
            floor((dev * dev).cast("double")
              / (col("n").cast("double") * col("r") * col("c"))
              * 1000000000 + 0.5).cast("bigint"))
        x.select(col("event_type"), col("dow").cast("bigint").as("dow"),
          col("obs").as("observed"), col("expected_e6"), col("contrib_e9"),
          sum(col("contrib_e9")).over(graft.ops.BoundedWindow.all())
            .cast("bigint").as("chi2_e9"))
      }),

    // ---- lag-k autocorrelation of the daily series (k = 1 and 7):
    // the seasonality detector a monitoring pipeline runs on every
    // metric — weekly periodicity shows up as high lag-7 ACF. The
    // series is the daily cents total per event type (integers); each
    // lag pairs the series with itself via ONE lag() window over the
    // DAILY AGGREGATE (days×types rows, never raw events), and the
    // correlation comes from exact integer moments — the same
    // wrap-proof covar/corr arithmetic as q_agg_covar_exact. ----
    QueryDef("q_events_autocorr", Some {
      def branch(k: Int) =
        s"""SELECT event_type, $k AS lag_k, c AS x,
           |  lag(c, $k) OVER (PARTITION BY event_type ORDER BY day) AS y
           |FROM b""".stripMargin
      s"""WITH b AS (
         |  SELECT event_type, epoch_us(ts) // $usPerDay AS day,
         |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2),
         |l AS (${branch(1)}
         |UNION ALL
         |${branch(7)}),
         |m AS (
         |  SELECT event_type, lag_k, count(*) AS n,
         |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         |    sum(x * x) AS sxx, sum(y * y) AS syy
         |  FROM l WHERE y IS NOT NULL GROUP BY event_type, lag_k)
         |SELECT event_type, CAST(lag_k AS INT) AS lag_k, n,
         |  CAST(n * sxy - sx * sy AS DOUBLE)
         |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
         |    / sqrt(CAST(n * syy - sy * sy AS DOUBLE)) AS acf
         |FROM m""".stripMargin
    })(
      (s, d) => {
        val b = Tables(s, d, "events")
          .select(col("event_type"),
            expr(s"unix_micros(ts) DIV $usPerDay").as("day"),
            floor(col("value") * 100 + 0.5).cast("bigint").as("cv"))
          .groupBy(col("event_type"), col("day"))
          .agg(sum(col("cv")).as("c"))
          .persist() // one pass per lag branch
        val wLag = Window.partitionBy(col("event_type")).orderBy(col("day"))
        def branch(k: Int) = b.select(col("event_type"),
          lit(k).as("lag_k"), col("c").as("x"),
          lag(col("c"), k).over(wLag).as("y"))
        def dec(c: Column) = c.cast("decimal(28,0)")
        branch(1).unionAll(branch(7))
          .where(col("y").isNotNull)
          .groupBy(col("event_type"), col("lag_k"))
          .agg(count(lit(1)).as("n"),
            sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
            sum(dec(col("x") * col("y"))).as("sxy"),
            sum(dec(col("x") * col("x"))).as("sxx"),
            sum(dec(col("y") * col("y"))).as("syy"))
          .select(col("event_type"), col("lag_k").cast("int").as("lag_k"), col("n"),
            ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
              / sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
              .as("acf"))
      }),

    // ---- time-to-convert distribution: for each converting user the
    // delay from first view to first subsequent purchase, summarized
    // as exact quartiles of the HOUR-bucketed delay — the product
    // question behind every funnel ("how long does conversion take").
    // Quartiles use the same histogram-rank arithmetic as the decile
    // query (4·cum ≥ k·n over the distinct-delay frame, pure
    // integers); the per-user delays come from the funnel's
    // one-row-per-user min-time joins, never a window over raw
    // events. ----
    QueryDef("q_events_time_to_convert", Some(
      s"""WITH e AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
         |v AS (
         |  SELECT user_id, min(tus) AS t1 FROM e
         |  WHERE event_type = 'view' GROUP BY user_id),
         |p AS (
         |  SELECT e.user_id,
         |    (min(e.tus) - v.t1) // 3600000000 AS delay_h
         |  FROM e JOIN v ON e.user_id = v.user_id
         |  WHERE e.event_type = 'purchase' AND e.tus > v.t1
         |  GROUP BY e.user_id, v.t1),
         |h AS (SELECT delay_h, count(*) AS cnt FROM p GROUP BY delay_h),
         |r AS (
         |  SELECT delay_h,
         |    sum(cnt) OVER (ORDER BY delay_h) AS cum,
         |    sum(cnt) OVER () AS n
         |  FROM h)
         |SELECT CAST(k AS INT) AS quartile, min(delay_h) AS delay_hours,
         |  CAST(min(n) AS BIGINT) AS n_converters
         |FROM (SELECT r.*, k.k FROM r, unnest(range(1, 4)) AS k(k)
         |      WHERE 4 * r.cum >= k.k * r.n)
         |GROUP BY k""".stripMargin))(
      (s, d) => {
        val e = Tables(s, d, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("tus"))
        val v = e.where(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("tus")).as("t1"))
        val p = e.where(col("event_type") === "purchase")
          .join(v, "user_id").where(col("tus") > col("t1"))
          .groupBy(col("user_id"), col("t1"))
          .agg(expr("(min(tus) - t1) DIV 3600000000").as("delay_h"))
        val h = p.groupBy(col("delay_h")).agg(count(lit(1)).as("cnt"))
        val wCum = graft.ops.BoundedWindow.ordered(col("delay_h"))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = graft.ops.BoundedWindow.all()
        h.withColumn("cum", sum(col("cnt")).over(wCum))
          .withColumn("n", sum(col("cnt")).over(wAll))
          .select(col("delay_h"), col("cum"), col("n"),
            explode(sequence(lit(1L), lit(3L))).as("k"))
          .where(lit(4) * col("cum") >= col("k") * col("n"))
          .groupBy(col("k").cast("int").as("quartile"))
          .agg(min(col("delay_h")).as("delay_hours"),
            min(col("n")).as("n_converters"))
      }),

    // ---- RFM segmentation: per-user Recency (days since last
    // event), Frequency (event count), Monetary (total cents), each
    // cut into quintiles — the classic lifecycle-marketing scoring,
    // all integers until the final segment label. The oracle keeps
    // ntile() (every ORDER BY carries the user_id tiebreak); Spark
    // computes the SAME buckets SIZE-ADAPTIVELY off the persisted
    // profile's measured count: at/below the ShardedRank threshold,
    // three plain bounded windows over the one small frame (the
    // interactive-scale plan — no join-backs); above it, three
    // branched ShardedRank passes so no window ever sorts the |users|
    // frame in one task: recency and frequency shard on (exact key,
    // user_id DIV 16384) — the low-cardinality keys whose tie classes
    // (e.g. every one-event user) would otherwise pile into one sort —
    // and near-unique monetary shards on $1000 value bands. One
    // user_id shuffle for the profile; at scale the only unpartitioned
    // windows run over per-shard aggregates. ----
    QueryDef("q_events_rfm", Some(
      s"""WITH mx AS (SELECT max(epoch_us(ts)) // $usPerDay AS today FROM events),
         |prof AS (
         |  SELECT user_id,
         |    mx.today - max(epoch_us(ts)) // $usPerDay AS recency_days,
         |    count(*) AS frequency,
         |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         |      AS monetary_cents
         |  FROM events, mx GROUP BY user_id, mx.today)
         |SELECT user_id, recency_days, frequency, monetary_cents,
         |  ntile(5) OVER (ORDER BY recency_days, user_id) AS r_quintile,
         |  ntile(5) OVER (ORDER BY frequency DESC, user_id) AS f_quintile,
         |  ntile(5) OVER (ORDER BY monetary_cents DESC, user_id) AS m_quintile
         |FROM prof""".stripMargin))(
      (s, d) => {
        import graft.ops.{BoundedWindow, ShardedRank}
        val e = Tables(s, d, "events")
          .select(col("user_id"),
            expr(s"unix_micros(ts) DIV $usPerDay").as("day"),
            floor(col("value") * 100 + 0.5).cast("bigint").as("cv"))
        def profile = e
          .crossJoin(broadcast(e.agg(max(col("day")).as("today"))))
          .groupBy(col("user_id"), col("today"))
          .agg((col("today") - max(col("day"))).as("recency_days"),
            count(lit(1)).as("frequency"),
            sum(col("cv")).as("monetary_cents"))
        val orders = Seq(
          (Seq(col("recency_days").asc, col("user_id").asc), "r_quintile"),
          (Seq(col("frequency").desc, col("user_id").asc), "f_quintile"),
          (Seq(col("monetary_cents").desc, col("user_id").asc), "m_quintile"))
        // |events| is a metadata-cheap count (no columns decoded) and an
        // upper bound on |users| — under the threshold the whole query
        // is ONE job: three ntile() windows over the bounded profile,
        // no persist, no exact count, no join-backs
        val thr = ShardedRank.threshold(s)
        if (Tables(s, d, "events").count() <= thr) {
          orders.foldLeft(profile) { case (acc, (ord, out)) =>
            acc.withColumn(out,
              ntile(5).over(BoundedWindow.ordered(ord: _*)).cast("bigint"))
          }.select(col("user_id"), col("recency_days"), col("frequency"),
            col("monetary_cents"), col("r_quintile"), col("f_quintile"),
            col("m_quintile"))
        } else {
          val prof = profile.persist() // the count + the rank passes read it
          val n = prof.count()
          val ush = expr("user_id DIV 16384")
          val passes = Seq(
            (Seq(col("recency_days"), ush), Seq(false, false),
              Seq(col("recency_days").asc, col("user_id").asc), "rn_r"),
            (Seq(col("frequency"), ush), Seq(true, false),
              Seq(col("frequency").desc, col("user_id").asc), "rn_f"),
            (Seq(expr("monetary_cents DIV 100000")), Seq(true),
              Seq(col("monetary_cents").desc, col("user_id").asc), "rn_m"))
          val ranked =
            if (n <= thr)
              // many events over few users: plain bounded windows off
              // the persisted profile, still one downstream job
              passes.foldLeft(prof) { case (acc, (_, _, ord, out)) =>
                ShardedRank.plainRowNumber(acc, ord, out)
              }
            else
              // BRANCHED, not chained: each rank pass runs off the
              // persisted profile and joins back a (user_id, rank)
              // pair — a chained fold would re-execute every earlier
              // pass inside the next pass's offsets branch (measured
              // ~4× the window work)
              passes.map { case (sh, dsc, ord, out) =>
                ShardedRank.rowNumber(prof, sh, dsc, ord, out)
                  .select(col("user_id"), col(out))
              }.foldLeft(prof)((acc, r) => acc.join(r, "user_id"))
          ranked.withColumn("n", lit(n))
            .select(col("user_id"), col("recency_days"), col("frequency"),
              col("monetary_cents"),
              expr(ShardedRank.ntileSql("rn_r", "n", 5)).as("r_quintile"),
              expr(ShardedRank.ntileSql("rn_f", "n", 5)).as("f_quintile"),
              expr(ShardedRank.ntileSql("rn_m", "n", 5)).as("m_quintile"))
        }
      }),

    // ---- peak session concurrency via a sweep line: the 30-min-gap
    // sessions (same definition as q_stream_sessionize_batch) explode
    // into +1/−1 boundary deltas; the time-ordered running sum counts
    // open sessions and its max is the capacity number a serving tier
    // provisions for. Intervals are closed ([first,last] event time),
    // so starts sort before ends at the same instant (delta DESC) —
    // a single-event session is momentarily open and two sessions
    // touching at a point are concurrent. The global sweep runs as
    // the two-phase sharded cumsum (hourly shards): parallelism
    // scales with the time span, never 1 task; equal (t,delta) runs
    // produce the same cum multiset under any intra-tie order, so
    // max and argmax stay deterministic. ----
    QueryDef("q_events_concurrency", Some(
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_id FROM events),
        |g AS (SELECT *, CASE WHEN lag(tus) OVER w IS NULL
        |                       OR tus - lag(tus) OVER w > 1800000000
        |                     THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |s AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
        |        ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |        AS session_id FROM g),
        |sess AS (SELECT user_id, session_id, min(tus) AS st, max(tus) AS en
        |         FROM s GROUP BY user_id, session_id),
        |b AS (SELECT st AS t, 1 AS delta FROM sess
        |      UNION ALL SELECT en AS t, -1 AS delta FROM sess),
        |c AS (SELECT t, delta,
        |        CAST(sum(delta) OVER (ORDER BY t, delta DESC
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM b),
        |m AS (SELECT max(cum) AS mx FROM c)
        |SELECT CAST((SELECT count(*) FROM sess) AS BIGINT) AS n_sessions,
        |  CAST(mx AS BIGINT) AS max_concurrent,
        |  CAST((SELECT min(t) FROM c, m m2 WHERE c.cum = m2.mx) AS BIGINT)
        |    AS t_at_max_us
        |FROM m""".stripMargin))(
      (s, d) => {
        val e = Tables(s, d, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("tus"),
            col("event_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tus").asc, col("event_id").asc)
        val sess = e
          .withColumn("new_s",
            when(lag(col("tus"), 1).over(w).isNull ||
              col("tus") - lag(col("tus"), 1).over(w) > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("new_s")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(min(col("tus")).as("st"), max(col("tus")).as("en"))
        val b = sess.select(col("st").as("t"), lit(1L).as("delta"))
          .unionByName(sess.select(col("en").as("t"), lit(-1L).as("delta")))
          .withColumn("shard", expr("t DIV 3600000000"))
        val wLoc = Window.partitionBy(col("shard"))
          .orderBy(col("t").asc, col("delta").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val local = b.withColumn("lcum", sum(col("delta")).over(wLoc))
        val wSh = graft.ops.BoundedWindow.ordered(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = b.groupBy(col("shard")).agg(sum(col("delta")).as("tot"))
          .withColumn("off", coalesce(sum(col("tot")).over(wSh), lit(0L)))
          .select(col("shard"), col("off"))
        val c = local.join(broadcast(offs), "shard")
          .withColumn("cum", col("lcum") + col("off"))
        val m = c.agg(max(col("cum")).as("mx"))
        val tAt = c.crossJoin(broadcast(m)).where(col("cum") === col("mx"))
          .agg(min(col("t")).as("t_at_max_us"), min(col("mx")).as("mx"))
        sess.agg(count(lit(1)).as("n_sessions"))
          .crossJoin(broadcast(tAt))
          .select(col("n_sessions"), col("mx").as("max_concurrent"),
            col("t_at_max_us"))
      }),

    // ---- interval union / gaps-and-islands: merge each user's
    // overlapping validity windows (event start + value-proportional
    // duration, the q_scd2_pit convention) into maximal islands and
    // report interval count, island count, and total covered time —
    // the dual of the concurrency sweep (how LONG covered vs how MANY
    // open). The island break uses a running max of interval ends
    // (ROWS UNBOUNDED..1 PRECEDING), not lag(en): with nested
    // intervals lag's end can close before an earlier interval does,
    // splitting an island that is actually connected. Touching
    // intervals (en == next st) merge. All integer micros; windows
    // are user-partitioned, so the shape scales with users. ----
    QueryDef("q_events_interval_coverage", Some(
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS st,
        |    epoch_us(ts) + CAST(floor(value*100 + 0.5) AS BIGINT) * 60000000
        |      AS en
        |  FROM events),
        |g AS (SELECT *, CASE WHEN max(en) OVER (PARTITION BY user_id
        |          ORDER BY st, en, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) >= st
        |        THEN 0 ELSE 1 END AS new_i
        |      FROM e),
        |i AS (SELECT *, CAST(sum(new_i) OVER (PARTITION BY user_id
        |        ORDER BY st, en, event_id ROWS UNBOUNDED PRECEDING)
        |        AS BIGINT) AS island FROM g),
        |isl AS (SELECT user_id, island, min(st) AS ist, max(en) AS ien,
        |          count(*) AS cnt
        |        FROM i GROUP BY user_id, island)
        |SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n_intervals,
        |  CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(ien - ist) AS BIGINT) AS covered_us
        |FROM isl GROUP BY user_id""".stripMargin))(
      (s, d) => {
        val e = Tables(s, d, "events").select(
          col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("st"),
          (unix_micros(col("ts")) +
            floor(col("value") * 100 + 0.5).cast("bigint") * 60000000L)
            .as("en"))
        val ord = Window.partitionBy(col("user_id"))
          .orderBy(col("st").asc, col("en").asc, col("event_id").asc)
        val runMax = ord.rowsBetween(Window.unboundedPreceding, -1)
        val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.withColumn("new_i",
            when(max(col("en")).over(runMax) >= col("st"), 0L).otherwise(1L))
          .withColumn("island", sum(col("new_i")).over(cum))
          .groupBy(col("user_id"), col("island"))
          .agg(min(col("st")).as("ist"), max(col("en")).as("ien"),
            count(lit(1)).as("cnt"))
          .groupBy(col("user_id"))
          .agg(sum(col("cnt")).cast("bigint").as("n_intervals"),
            count(lit(1)).cast("bigint").as("n_islands"),
            sum(col("ien") - col("ist")).cast("bigint").as("covered_us"))
      }),

    // ---- last-touch attribution: each purchase is credited to the
    // user's most recent click no older than 7 days, else 'organic' —
    // the marketing-attribution join every event warehouse answers.
    // Shape: ONE user-partitioned window over only the click+purchase
    // subset (filter pushed below the shuffle); the strictly-before
    // last-click time is max(CASE WHEN click THEN tus END) over ROWS
    // UNBOUNDED..1 PRECEDING (max ignores NULLs in both engines, and
    // the (tus, event_id) order is total so the prefix is identical).
    // No per-conversion as-of join: the LOCF-style running max carries
    // the same answer in a single pass. Money in exact cents. ----
    QueryDef("q_events_attribution", Some(
      s"""WITH e AS (
         |  SELECT user_id, event_type, event_id, epoch_us(ts) AS tus,
         |    CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
         |  FROM events WHERE event_type IN ('click', 'purchase')),
         |t AS (
         |  SELECT event_type, tus, cents,
         |    max(CASE WHEN event_type = 'click' THEN tus END)
         |      OVER (PARTITION BY user_id ORDER BY tus, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS last_click_tus
         |  FROM e)
         |SELECT CASE WHEN last_click_tus IS NOT NULL
         |            AND tus - last_click_tus <= ${7 * usPerDay}
         |       THEN 'click' ELSE 'organic' END AS channel,
         |  count(*) AS n_purchases,
         |  CAST(sum(cents) AS BIGINT) AS cents,
         |  CAST(sum(cents) AS DOUBLE) / 100.0 AS revenue
         |FROM t WHERE event_type = 'purchase'
         |GROUP BY 1""".stripMargin))(
      (s, d) => {
        val e = Tables(s, d, "events")
          .where(col("event_type").isin("click", "purchase"))
          .select(col("user_id"), col("event_type"), col("event_id"),
            unix_micros(col("ts")).as("tus"),
            floor(col("value") * 100 + 0.5).cast("bigint").as("cents"))
        val before = Window.partitionBy(col("user_id"))
          .orderBy(col("tus").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        e.withColumn("last_click_tus",
            max(when(col("event_type") === "click", col("tus"))).over(before))
          .where(col("event_type") === "purchase")
          .groupBy(
            when(col("last_click_tus").isNotNull
              && col("tus") - col("last_click_tus") <= lit(7L * usPerDay),
              "click").otherwise("organic").as("channel"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(col("cents")).cast("bigint").as("cents"),
            (sum(col("cents")).cast("double") / 100.0).as("revenue"))
      }),

    // ---- multi-touch attribution profile: per purchase, how many
    // clicks sit inside its 7-day lookback — the touch-count
    // distribution (0 / 1 / 2 / 3+) that decides whether last-touch
    // credit (q_events_attribution) is even defensible, and the
    // denominator a linear-credit model would divide by. One
    // user-partitioned RANGE-frame window over the click+purchase
    // subset: value-based frames are tie-order-invariant, and the
    // conditional count never sees other event types because the
    // filter is pushed below the shuffle. ----
    QueryDef("q_events_attribution_multi", Some(
      s"""WITH e AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS tus,
         |    CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
         |  FROM events WHERE event_type IN ('click', 'purchase')),
         |t AS (
         |  SELECT event_type, cents,
         |    count(CASE WHEN event_type = 'click' THEN 1 END)
         |      OVER (PARTITION BY user_id ORDER BY tus
         |            RANGE BETWEEN ${7 * usPerDay} PRECEDING AND CURRENT ROW)
         |      AS n_touches
         |  FROM e)
         |SELECT least(n_touches, 3) AS touch_bucket,
         |  count(*) AS n_purchases,
         |  CAST(sum(cents) AS BIGINT) AS cents,
         |  CAST(sum(cents) AS DOUBLE) / 100.0 AS revenue
         |FROM t WHERE event_type = 'purchase'
         |GROUP BY least(n_touches, 3)""".stripMargin))(
      (s, d) => {
        val e = Tables(s, d, "events")
          .where(col("event_type").isin("click", "purchase"))
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("tus"),
            floor(col("value") * 100 + 0.5).cast("bigint").as("cents"))
        val lookback = Window.partitionBy(col("user_id"))
          .orderBy(col("tus"))
          .rangeBetween(-7L * usPerDay, Window.currentRow)
        e.withColumn("n_touches",
            count(when(col("event_type") === "click", 1)).over(lookback))
          .where(col("event_type") === "purchase")
          .groupBy(least(col("n_touches"), lit(3L)).as("touch_bucket"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(col("cents")).cast("bigint").as("cents"),
            (sum(col("cents")).cast("double") / 100.0).as("revenue"))
      }),

    // ---- cumulative reach: distinct users ever seen, by day — the
    // audience-growth curve. Exact without any distinct-over-window:
    // each user collapses to their FIRST-seen day (one hash agg over
    // |users| keys), new-user counts land on |days| rows, and the
    // running total is a window over that bounded frame (days grow
    // with calendar time, not data volume — at 100 TB this window is
    // still a few thousand rows). ----
    QueryDef("q_events_cum_reach", Some(
      s"""WITH f AS (
         |  SELECT user_id, min(epoch_us(ts) // $usPerDay) AS first_day
         |  FROM events GROUP BY user_id),
         |n AS (SELECT first_day AS day, count(*) AS new_users
         |      FROM f GROUP BY first_day)
         |SELECT day, new_users,
         |  CAST(sum(new_users) OVER (ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_users
         |FROM n""".stripMargin))(
      (s, d) => {
        val f = Tables(s, d, "events")
          .groupBy(col("user_id"))
          .agg(min(expr(s"unix_micros(ts) DIV $usPerDay")).as("first_day"))
        val n = f.groupBy(col("first_day").as("day"))
          .agg(count(lit(1)).as("new_users"))
        n.withColumn("cum_users",
          sum(col("new_users")).over(graft.ops.BoundedWindow.ordered(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("bigint"))
      }),

    // ---- Gini coefficient of revenue concentration across purchasing
    // users — the inequality summary ("do 1% of users drive 90% of
    // revenue?") behind sampling and capping decisions. Exact rational
    // arithmetic via the rank-sum identity: for per-user cents x sorted
    // ascending, 2·Σ i·x_i = Σ_v v·c·(2·cum − c + 1) over the DISTINCT-
    // value frame (ties share a value, so any tie order gives the same
    // sum), then G = (2Σi·x_i − (n+1)·Σx) / (n·Σx) with one final
    // double division. The cumsum runs on the sharded two-phase
    // pattern (per-shard window + broadcast shard offsets), so no
    // global sort even with billions of users; products go through
    // DECIMAL(38,0) (v·c·cum can pass int64 at scale). ----
    QueryDef("q_events_gini", Some(
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |g AS (SELECT cents AS v, count(*) AS c FROM u GROUP BY cents),
        |r AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cum FROM g),
        |a AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |        CAST(sum(CAST(v AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS s,
        |        CAST(sum(CAST(v AS DECIMAL(38,0)) * c * (2*cum - c + 1))
        |          AS DECIMAL(38,0)) AS s2
        |      FROM r)
        |SELECT n AS n_users, CAST(s AS BIGINT) AS total_cents,
        |  CASE WHEN n = 0 OR s = 0 THEN NULL
        |       ELSE CAST(s2 - (n+1)*s AS DOUBLE)
        |            / CAST(n * s AS DOUBLE) END AS gini
        |FROM a""".stripMargin))(
      (s, d) => {
        val u = Tables(s, d, "events")
          .where(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(sum(floor(col("value") * 100 + 0.5).cast("bigint"))
            .cast("bigint").as("cents"))
        val g = u.groupBy(col("cents").as("v")).agg(count(lit(1)).as("c"))
          .withColumn("shard", expr("v DIV 65536"))
        // sharded two-phase cumsum (q_eval_auc pattern): local window
        // within a value-range shard, then broadcast shard offsets
        val wLoc = Window.partitionBy(col("shard")).orderBy(col("v"))
        val local = g.withColumn("lcum", sum(col("c")).over(wLoc))
        val wSh = graft.ops.BoundedWindow.ordered(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = g.groupBy(col("shard")).agg(sum(col("c")).as("tot"))
          .withColumn("off", coalesce(sum(col("tot")).over(wSh), lit(0L)))
          .select(col("shard"), col("off"))
        val r = local.join(broadcast(offs), "shard")
          .withColumn("cum", col("lcum") + col("off"))
        val dv = col("v").cast("decimal(38,0)")
        r.agg(sum(col("c")).cast("bigint").as("n"),
            sum(dv * col("c")).cast("decimal(38,0)").as("s"),
            sum(dv * col("c") * (lit(2) * col("cum") - col("c") + 1))
              .cast("decimal(38,0)").as("s2"))
          .select(col("n").as("n_users"),
            col("s").cast("bigint").as("total_cents"),
            when(col("n") === 0 || col("s") === 0, lit(null))
              .otherwise((col("s2") - (col("n") + 1) * col("s")).cast("double")
                / (col("n") * col("s")).cast("double")).as("gini"))
      }),

    // ---- top session paths: 30-minute-gap sessions (the engine's
    // standing sessionization convention), each session rendered as
    // its ordered event-type path, top 10 paths by frequency with a
    // total (count DESC, path ASC) order so the LIMIT is
    // deterministic in both engines. Spark has no ordered string_agg,
    // so the path is built order-free: sort_array over
    // (tus, event_id, type) structs — lexicographic struct order IS
    // the session order — then transform + array_join; sessions are
    // bounded by the gap rule, so the collected array is small by
    // construction, never corpus-sized. ----
    QueryDef("q_events_top_paths", Some(
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
        |  FROM events),
        |s AS (
        |  SELECT *, CASE WHEN tus - lag(tus)
        |      OVER (PARTITION BY user_id ORDER BY tus, event_id)
        |      > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |ss AS (
        |  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS sess
        |  FROM s),
        |p AS (
        |  SELECT user_id, sess,
        |    string_agg(event_type, '>' ORDER BY tus, event_id) AS path
        |  FROM ss GROUP BY user_id, sess)
        |SELECT path, count(*) AS n_sessions
        |FROM p GROUP BY path
        |ORDER BY n_sessions DESC, path
        |LIMIT 10""".stripMargin))(
      (s, d) => {
        val e = Tables(s, d, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("tus"))
        val ord = Window.partitionBy(col("user_id"))
          .orderBy(col("tus").asc, col("event_id").asc)
        val sess = e
          .withColumn("brk",
            when(col("tus") - lag(col("tus"), 1).over(ord) > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("sess", sum(col("brk")).over(
            ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        sess.groupBy(col("user_id"), col("sess"))
          .agg(array_join(
            transform(
              sort_array(collect_list(struct(col("tus"), col("event_id"),
                col("event_type").as("t")))),
              x => x.getField("t")), ">").as("path"))
          .groupBy(col("path"))
          .agg(count(lit(1)).as("n_sessions"))
          .orderBy(col("n_sessions").desc, col("path").asc)
          .limit(10)
      }),

    // ---- sequence-pattern detection (MATCH_RECOGNIZE-style): each
    // user's ordered event history becomes ONE symbol string
    // (v/c/p/s/e), conversion is then a REGEX over that string and
    // direct view→purchase hand-offs a substring-occurrence count.
    // Scale shape: the per-user sequence is bounded state — the
    // collect_list partial-aggregates map-side and its size is the
    // user's own event count (at 100 TB you'd bound it with the
    // session window first, exactly as q_events_top_paths does) — and
    // the regex runs once per USER, not per event. (user_id, ts) is
    // unique in the fixture at every SF, so array_sort over the
    // (tus, ch) struct yields one deterministic string per user in
    // both engines; the v[vces]*p / 'vp' patterns use only literal
    // classes, identical under Java regex and RE2. ----
    QueryDef("q_events_pattern", Some(
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tus,
        |    CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        |      WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
        |      ELSE 'e' END AS ch
        |  FROM events),
        |s AS (
        |  SELECT user_id, string_agg(ch, '' ORDER BY tus) AS seq
        |  FROM e GROUP BY user_id)
        |SELECT user_id, seq, CAST(length(seq) AS BIGINT) AS n_events,
        |  CAST((length(seq) - length(replace(seq, 'vp', ''))) // 2
        |    AS BIGINT) AS n_direct_vp,
        |  CAST(CASE WHEN regexp_matches(seq, 'v[vces]*p') THEN 1 ELSE 0 END
        |    AS BIGINT) AS converted
        |FROM s""".stripMargin))(
      (s, d) => {
        val e = Tables(s, d, "events").select(col("user_id"),
          unix_micros(col("ts")).as("tus"),
          expr("CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'" +
            " WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'" +
            " ELSE 'e' END").as("ch"))
        e.groupBy(col("user_id"))
          .agg(array_join(
            transform(
              sort_array(collect_list(struct(col("tus"), col("ch")))),
              x => x.getField("ch")), "").as("seq"))
          .select(col("user_id"), col("seq"),
            length(col("seq")).cast("bigint").as("n_events"),
            expr("CAST((length(seq) - length(replace(seq, 'vp', '')))" +
              " DIV 2 AS BIGINT)").as("n_direct_vp"),
            expr("CAST(CASE WHEN seq RLIKE 'v[vces]*p' THEN 1 ELSE 0 END" +
              " AS BIGINT)").as("converted"))
      }),

    // ---- maximum drawdown per user over the purchase-value series:
    // running peak (a ROWS-unbounded-preceding max — tie-order
    // invariant because (user_id, ts) is unique at every SF) minus
    // the current value, maximized per user — the risk metric every
    // monitoring/finance pipeline computes, and a window shape the
    // catalog didn't yet pin: running MAX (non-invertible, so engines
    // can't use the sliding-sum trick; both must carry the prefix
    // extremum). Values ride integer cents end-to-end; the window
    // partitions by user (hash-partition parallel at 1000 executors,
    // no global single-partition window). ----
    QueryDef("q_events_drawdown", Some(
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tus,
        |    CAST(floor(value*100 + 0.5) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT user_id, v,
        |    CAST(max(v) OVER (PARTITION BY user_id ORDER BY tus
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS peak
        |  FROM e)
        |SELECT user_id, count(1) AS n,
        |  CAST(max(peak - v) AS BIGINT) AS max_drawdown_cents,
        |  CAST(max(peak) AS BIGINT) AS peak_cents
        |FROM r GROUP BY user_id""".stripMargin))(
      (s, d) => {
        val e = Tables(s, d, "events")
          .where(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("tus"),
            floor(col("value") * 100 + 0.5).cast("bigint").as("v"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.withColumn("peak", max(col("v")).over(w).cast("bigint"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            max(col("peak") - col("v")).cast("bigint").as("max_drawdown_cents"),
            max(col("peak")).cast("bigint").as("peak_cents"))
      }),

    // ---- week-over-week growth of the daily purchase total: a
    // SELF-JOIN of the daily aggregate on day − 7 (|days| rows, never
    // raw events — the same pre-aggregate discipline as the autocorr
    // entry). A self-join, NOT lag(cents, 7): a row-based lag over a
    // sparse daily series silently compares against the 7th prior
    // PRESENT day rather than the same weekday, and the unpartitioned
    // ORDER BY window it needs is a single-task bottleneck anyway —
    // the equi-join is both calendar-correct and shuffle-parallel.
    // Growth is an EXACT scaled integer, sign-split so both operands
    // of the integer division are non-negative — DuckDB's `//` floors
    // while Spark's DIV truncates toward zero, and the two only agree
    // on non-negative operands (the catalog's integer-division parity
    // rule from the PageRank entry applied to a signed delta). ----
    QueryDef("q_events_wow", Some(
      s"""WITH dy AS (
         |  SELECT CAST(epoch_us(ts) // $usPerDay AS BIGINT) AS day,
         |    CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT)
         |      AS cents
         |  FROM events WHERE event_type = 'purchase'
         |  GROUP BY CAST(epoch_us(ts) // $usPerDay AS BIGINT)),
         |l AS (
         |  SELECT a.day AS day, a.cents AS cents, b.cents AS prev
         |  FROM dy a LEFT JOIN dy b ON b.day = a.day - 7)
         |SELECT day, cents, CAST(prev AS BIGINT) AS prev_cents,
         |  CAST(CASE
         |    WHEN prev IS NULL OR prev = 0 THEN NULL
         |    WHEN cents >= prev THEN ((cents - prev) * 1000000) // prev
         |    ELSE -(((prev - cents) * 1000000) // prev)
         |  END AS BIGINT) AS wow_e6
         |FROM l""".stripMargin))(
      (s, d) => {
        val dy = Tables(s, d, "events")
          .where(col("event_type") === "purchase")
          .groupBy((unix_micros(col("ts")).cast("bigint") / usPerDay)
            .cast("bigint").as("day"))
          .agg(sum(floor(col("value") * 100 + 0.5).cast("bigint"))
            .cast("bigint").as("cents"))
        val prev = dy.select(col("day").as("pday"), col("cents").as("prev"))
        dy.join(prev, col("pday") === col("day") - 7, "left")
          .select(col("day"), col("cents"),
            col("prev").cast("bigint").as("prev_cents"),
            expr("""CAST(CASE
              WHEN prev IS NULL OR prev = 0 THEN NULL
              WHEN cents >= prev THEN ((cents - prev) * 1000000) DIV prev
              ELSE -(((prev - cents) * 1000000) DIV prev)
            END AS BIGINT)""").as("wow_e6"))
      }),

    // ---- seasonal-naive forecast backtest: the forecast for
    // day d is the actual of day d−7 (the baseline every forecasting
    // system must beat), scored per event type over all days where
    // both sides exist. The error aggregate is sum|actual − forecast|
    // in exact integer cents plus the worst single day, and MAE is
    // ONE double division at the end — so the backtest itself is
    // bit-oracled. Same day−7 equi-join shape as q_events_wow (never
    // a window over the raw events); the per-(type, day) totals frame
    // is |types|·|days|, bounded. ----
    QueryDef("q_events_seasonal_naive", Some(
      s"""WITH dy AS (
         |  SELECT event_type, CAST(epoch_us(ts) // $usPerDay AS BIGINT) AS day,
         |    CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT)
         |      AS cents
         |  FROM events
         |  GROUP BY event_type, CAST(epoch_us(ts) // $usPerDay AS BIGINT)),
         |j AS (
         |  SELECT a.event_type, a.day, a.cents, b.cents AS fc
         |  FROM dy a JOIN dy b
         |    ON b.event_type = a.event_type AND b.day = a.day - 7)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
         |  CAST(sum(abs(cents - fc)) AS BIGINT) AS sae_cents,
         |  CAST(max(abs(cents - fc)) AS BIGINT) AS worst_cents,
         |  CAST(sum(abs(cents - fc)) AS DOUBLE) / count(*) / 100.0 AS mae
         |FROM j GROUP BY event_type""".stripMargin))(
      (s, d) => {
        val dy = Tables(s, d, "events")
          .groupBy(col("event_type"),
            (unix_micros(col("ts")).cast("bigint") / usPerDay)
              .cast("bigint").as("day"))
          .agg(sum(floor(col("value") * 100 + 0.5).cast("bigint"))
            .cast("bigint").as("cents"))
        // shift the forecast side so the join is a plain TWO-key
        // equi-join on (event_type, day) — keyed on event_type alone
        // the |days|² filter would run per type
        val prev = dy.select(col("event_type"), (col("day") + 7).as("day"),
          col("cents").as("fc"))
        val err = abs(col("cents") - col("fc"))
        dy.join(prev, Seq("event_type", "day"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            sum(err).cast("bigint").as("sae_cents"),
            max(err).cast("bigint").as("worst_cents"))
          .select(col("event_type"), col("n_days"), col("sae_cents"),
            col("worst_cents"),
            (col("sae_cents").cast("double") / col("n_days") / lit(100.0))
              .as("mae"))
      }),

    // ---- regression metrics over the seasonal-naive backtest: MAE,
    // RMSE, signed bias and R² per event type — the eval quartet a
    // forecasting (or any regression-label) pipeline reports, absent
    // from the model-eval suite until now. All moments are EXACT
    // integers (DECIMAL(38,0)/HUGEINT — SSE at web-scale day counts
    // would wrap int64), R² uses the n·Σa²−(Σa)² identity so no mean
    // is ever materialized, and the only doubles are the four final
    // expressions (sqrt is IEEE-exact). Same (type, day−7) two-key
    // equi-join as q_events_seasonal_naive. ----
    QueryDef("q_eval_forecast_metrics", Some(
      s"""WITH dy AS (
         |  SELECT event_type, CAST(epoch_us(ts) // $usPerDay AS BIGINT) AS day,
         |    CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT)
         |      AS cents
         |  FROM events
         |  GROUP BY event_type, CAST(epoch_us(ts) // $usPerDay AS BIGINT)),
         |j AS (
         |  SELECT a.event_type, a.cents AS av, b.cents AS fc
         |  FROM dy a JOIN dy b
         |    ON b.event_type = a.event_type AND b.day = a.day - 7),
         |m AS (
         |  SELECT event_type, count(*) AS n,
         |    CAST(sum(av) AS HUGEINT) AS sa,
         |    sum(CAST(av AS HUGEINT) * av) AS saa,
         |    CAST(sum(av - fc) AS HUGEINT) AS se,
         |    CAST(sum(abs(av - fc)) AS HUGEINT) AS sae,
         |    sum(CAST(av - fc AS HUGEINT) * (av - fc)) AS sse
         |  FROM j GROUP BY event_type)
         |SELECT event_type, CAST(n AS BIGINT) AS n_days,
         |  CAST(sae AS DOUBLE) / n / 100.0 AS mae,
         |  sqrt(CAST(sse AS DOUBLE) / n) / 100.0 AS rmse,
         |  CAST(se AS DOUBLE) / n / 100.0 AS bias,
         |  1.0 - CAST(n * sse AS DOUBLE) / CAST(n * saa - sa * sa AS DOUBLE)
         |    AS r2
         |FROM m""".stripMargin))(
      (s, d) => {
        val dy = Tables(s, d, "events")
          .groupBy(col("event_type"),
            (unix_micros(col("ts")).cast("bigint") / usPerDay)
              .cast("bigint").as("day"))
          .agg(sum(floor(col("value") * 100 + 0.5).cast("bigint"))
            .cast("bigint").as("cents"))
        val prev = dy.select(col("event_type"), (col("day") + 7).as("day"),
          col("cents").as("fc"))
        val errD = (col("av") - col("fc")).cast("decimal(38,0)")
        val m = dy.withColumnRenamed("cents", "av")
          .join(prev, Seq("event_type", "day"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("av").cast("decimal(38,0)")).as("sa"),
            sum(col("av").cast("decimal(38,0)") * col("av")).as("saa"),
            sum(errD).as("se"),
            sum(abs(col("av") - col("fc")).cast("decimal(38,0)")).as("sae"),
            sum(errD * (col("av") - col("fc"))).as("sse"))
        val nD = col("n").cast("decimal(38,0)")
        m.select(col("event_type"), col("n").cast("bigint").as("n_days"),
          (col("sae").cast("double") / col("n") / lit(100.0)).as("mae"),
          (sqrt(col("sse").cast("double") / col("n")) / lit(100.0)).as("rmse"),
          (col("se").cast("double") / col("n") / lit(100.0)).as("bias"),
          (lit(1.0) - (nD * col("sse")).cast("double")
            / (nD * col("saa") - col("sa") * col("sa")).cast("double"))
            .as("r2"))
      }),

    // ---- time-decayed value per event type with a one-week half-life
    // — the recency-weighted engagement score. Decay weights are EXACT
    // dyadic rationals, not exp(): age in half-lives k = (max_day −
    // day) div 7 (clamped to 40), weight 2^(−k), and every event
    // contributes cents·2^(40−k) — an integer — to a DECIMAL(38,0)/
    // HUGEINT sum (cents·2^40 alone overflows int64). ONE double cast
    // + division by the constant 2^40 at the end converts the exact
    // scaled sum to the reported score, so there is no transcendental
    // and no order-dependent float accumulation anywhere; the >2^53
    // wide-integer→DOUBLE parity is the chi-square precedent. The
    // anchor max(day) is a 1-row broadcast. Scale: one scan, one
    // partial+final agg. ----
    QueryDef("q_events_decay", Some(
      s"""WITH e AS (
         |  SELECT event_type,
         |    CAST(floor(value*100 + 0.5) AS BIGINT) AS cents,
         |    CAST(epoch_us(ts) // $usPerDay AS BIGINT) AS day
         |  FROM events),
         |m AS (SELECT max(day) AS mx FROM e),
         |w AS (SELECT event_type, cents,
         |        least((m.mx - e.day) // 7, 40) AS k FROM e, m)
         |SELECT event_type, count(*) AS n_events,
         |  CAST(sum(CAST(cents AS HUGEINT)
         |        * (CAST(1 AS BIGINT) << CAST(40 - k AS INTEGER)))
         |      AS DOUBLE) / 1099511627776.0 AS decayed_cents
         |FROM w GROUP BY event_type""".stripMargin))(
      (s, d) => {
        val e = Tables(s, d, "events").select(
          col("event_type"),
          floor(col("value") * 100 + 0.5).cast("bigint").as("cents"),
          (unix_micros(col("ts")).cast("bigint") / usPerDay).cast("bigint")
            .as("day"))
        val m = e.agg(max(col("day")).as("mx"))
        e.crossJoin(broadcast(m))
          .withColumn("k", least(expr("(mx - day) div 7"), lit(40L)))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            (sum(col("cents").cast("decimal(38,0)")
                * expr("shiftleft(CAST(1 AS BIGINT), CAST(40 - k AS INT))")
                  .cast("decimal(38,0)"))
              .cast("double") / lit(1099511627776.0)).as("decayed_cents"))
      }),

    // ---- rolling 7-day distinct users per day (WAU): COUNT DISTINCT
    // over a sliding window, which no engine's window functions
    // support directly (distinct state isn't mergeable across frame
    // slides). The scale-safe shape: dedupe to (user, active-day)
    // first, then each active day COVERS the 7 report days it counts
    // toward via a bounded sequence-explode (fan-out exactly 7, row-
    // local), dedupe (user, report-day), and count — three hash
    // shuffles, no window at all, fan-out independent of corpus size.
    // The oracle states the identical cover construction. Report days
    // clamp to the observed [min, max] range (1-row broadcast). ----
    QueryDef("q_events_rolling_distinct", Some(
      s"""WITH ud AS (
         |  SELECT DISTINCT user_id,
         |    CAST(epoch_us(ts) // $usPerDay AS BIGINT) AS day
         |  FROM events),
         |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ud),
         |cover AS (
         |  SELECT DISTINCT user_id, day + o.o AS rday
         |  FROM ud, unnest(range(0, 7)) AS o(o))
         |SELECT cover.rday AS day, count(*) AS wau
         |FROM cover, b
         |WHERE cover.rday BETWEEN b.mn AND b.mx
         |GROUP BY cover.rday""".stripMargin))(
      (s, d) => {
        val ud = Tables(s, d, "events")
          .select(col("user_id"),
            (unix_micros(col("ts")).cast("bigint") / usPerDay).cast("bigint")
              .as("day"))
          .distinct()
        val b = ud.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
        val cover = ud
          .select(col("user_id"),
            explode(expr("sequence(day, day + 6)")).as("rday"))
          .distinct()
        cover.crossJoin(broadcast(b))
          .where(col("rday").between(col("mn"), col("mx")))
          .groupBy(col("rday").as("day"))
          .agg(count(lit(1)).as("wau"))
      }),

    // ---- rolling 7-day OLS trend per event type: the q_agg_regression
    // exact-moment machinery moved INSIDE a window frame — five
    // windowed sums (n, Σx, Σy, Σx², Σxy) over ROWS 6 PRECEDING give a
    // per-day least-squares slope of daily cents against the epoch-day
    // index, the trend-detection operator a monitoring pipeline runs.
    // Products are formed in DECIMAL(38,0)/HUGEINT BEFORE the windowed
    // sum (day ≈ 2e4 and daily cents can be large; the OLS-entry
    // precedent), the slope is ONE double division of two exact
    // integers, and the degenerate frames (n < 2, or zero x-variance)
    // are NULLed by an exact CASE — never a NaN whose propagation
    // differs by engine. The frame is over PRESENT days (sparse days
    // shorten the lookback; densify with the LOCF grid first if
    // calendar-exact windows are needed). One daily pre-aggregate,
    // one type-partitioned window pass. ----
    QueryDef("q_events_rolling_slope", Some(
      s"""WITH dy AS (
         |  SELECT event_type,
         |    CAST(epoch_us(ts) // $usPerDay AS BIGINT) AS day,
         |    CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT)
         |      AS cents
         |  FROM events GROUP BY 1, 2),
         |w AS (
         |  SELECT event_type, day, cents,
         |    count(*) OVER f AS n,
         |    CAST(sum(day) OVER f AS HUGEINT) AS sx,
         |    CAST(sum(cents) OVER f AS HUGEINT) AS sy,
         |    sum(CAST(day AS HUGEINT)*day) OVER f AS sxx,
         |    sum(CAST(day AS HUGEINT)*cents) OVER f AS sxy
         |  FROM dy
         |  WINDOW f AS (PARTITION BY event_type ORDER BY day
         |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
         |SELECT event_type, day, cents, CAST(n AS BIGINT) AS n_window,
         |  CASE WHEN n >= 2 AND n*sxx - sx*sx <> 0
         |    THEN CAST(n*sxy - sx*sy AS DOUBLE)
         |         / CAST(n*sxx - sx*sx AS DOUBLE)
         |  END AS slope7
         |FROM w""".stripMargin))(
      (s, d) => {
        val dy = Tables(s, d, "events")
          .groupBy(col("event_type"),
            (unix_micros(col("ts")).cast("bigint") / usPerDay).cast("bigint")
              .as("day"))
          .agg(sum(floor(col("value") * 100 + 0.5).cast("bigint"))
            .cast("bigint").as("cents"))
        val f = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(-6, 0)
        val w = dy
          .withColumn("n", count(lit(1)).over(f))
          .withColumn("sx", sum(col("day").cast("decimal(38,0)")).over(f))
          .withColumn("sy", sum(col("cents").cast("decimal(38,0)")).over(f))
          .withColumn("sxx",
            sum(col("day").cast("decimal(38,0)") * col("day")).over(f))
          .withColumn("sxy",
            sum(col("day").cast("decimal(38,0)") * col("cents")).over(f))
        val nD = col("n").cast("decimal(38,0)")
        val denom = nD * col("sxx") - col("sx") * col("sx")
        w.select(col("event_type"), col("day"), col("cents"),
          col("n").cast("bigint").as("n_window"),
          when(col("n") >= 2 && denom =!= 0,
            (nD * col("sxy") - col("sx") * col("sy")).cast("double")
              / denom.cast("double")).as("slope7"))
      }),

    // ---- growth accounting: every day's active users decomposed into
    // NEW (first-ever activity), RETAINED (also active the previous
    // day) and RESURRECTED (returning after a gap), plus the day's
    // CHURNED count (active yesterday, absent today) — the standard
    // DAU decomposition, with the invariant new + retained +
    // resurrected = active built into the output. One FULL OUTER
    // self-join of the deduped (user, day) frame against itself
    // shifted by one day classifies every (user, day±1) incidence;
    // first-activity days come from a min-aggregate joined back.
    // All counts are exact integers; days clamp to the observed range
    // (a 1-row broadcast) so the trailing churn row of max_day+1
    // doesn't invent a calendar day. Scale: dedupe + two equi-joins +
    // one hash agg, all keyed on user — no window over the corpus. ----
    QueryDef("q_events_growth", Some(
      s"""WITH ud AS (
         |  SELECT DISTINCT user_id,
         |    CAST(epoch_us(ts) // $usPerDay AS BIGINT) AS day
         |  FROM events),
         |fu AS (SELECT user_id, min(day) AS fday FROM ud GROUP BY user_id),
         |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ud),
         |j AS (
         |  SELECT coalesce(t.user_id, y.user_id) AS user_id,
         |    coalesce(t.day, y.day + 1) AS day,
         |    CASE WHEN t.user_id IS NOT NULL THEN 1 ELSE 0 END AS today,
         |    CASE WHEN y.user_id IS NOT NULL THEN 1 ELSE 0 END AS yest
         |  FROM ud t FULL JOIN ud y
         |    ON y.user_id = t.user_id AND y.day = t.day - 1)
         |SELECT j.day,
         |  CAST(sum(j.today) AS BIGINT) AS active,
         |  CAST(sum(CASE WHEN j.today = 1 AND fu.fday = j.day
         |    THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
         |  CAST(sum(j.today * j.yest) AS BIGINT) AS retained,
         |  CAST(sum(CASE WHEN j.today = 1 AND j.yest = 0 AND fu.fday < j.day
         |    THEN 1 ELSE 0 END) AS BIGINT) AS resurrected,
         |  CAST(sum(CASE WHEN j.today = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS churned
         |FROM j JOIN fu ON fu.user_id = j.user_id CROSS JOIN b
         |WHERE j.day BETWEEN b.mn AND b.mx
         |GROUP BY j.day""".stripMargin))(
      (s, d) => {
        val ud = Tables(s, d, "events")
          .select(col("user_id"),
            (unix_micros(col("ts")).cast("bigint") / usPerDay).cast("bigint")
              .as("day"))
          .distinct()
        val fu = ud.groupBy(col("user_id")).agg(min(col("day")).as("fday"))
        val b = ud.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
        val t = ud.select(col("user_id").as("tu"), col("day").as("td"))
        val y = ud.select(col("user_id").as("yu"), col("day").as("yd"))
        val j = t.join(y, col("yu") === col("tu") && col("yd") === col("td") - 1,
            "full_outer")
          .select(coalesce(col("tu"), col("yu")).as("user_id"),
            coalesce(col("td"), col("yd") + 1).as("day"),
            when(col("tu").isNotNull, 1L).otherwise(0L).as("today"),
            when(col("yu").isNotNull, 1L).otherwise(0L).as("yest"))
        j.join(fu, "user_id").crossJoin(broadcast(b))
          .where(col("day").between(col("mn"), col("mx")))
          .groupBy(col("day"))
          .agg(sum(col("today")).cast("bigint").as("active"),
            sum(when(col("today") === 1 && col("fday") === col("day"), 1L)
              .otherwise(0L)).cast("bigint").as("new_users"),
            sum(col("today") * col("yest")).cast("bigint").as("retained"),
            sum(when(col("today") === 1 && col("yest") === 0
                && col("fday") < col("day"), 1L)
              .otherwise(0L)).cast("bigint").as("resurrected"),
            sum(when(col("today") === 0, 1L).otherwise(0L)).cast("bigint")
              .as("churned"))
      }),

    // ---- cohort LTV curve: cumulative purchase revenue per user by
    // days-since-acquisition, per acquisition cohort — the
    // revenue-based companion to the count-based retention matrix.
    // Cohort = each user's first-activity day (ANY event type, so
    // zero-revenue users still dilute the denominator, as a real LTV
    // does); offsets come from purchases joined back to the cohort
    // frame; the curve is a running sum over the |cohorts|×|offsets|
    // cell grid (bounded by days², never by users), cumulated with a
    // per-cohort ROWS window ordered by offset — gaps in offsets are
    // fine because the cells are pre-aggregated. LTV is exact
    // integer cents DIV cohort size (non-negative), plus one double
    // division for the readable form. ----
    QueryDef("q_events_cohort_ltv", Some(
      s"""WITH fu AS (
         |  SELECT user_id,
         |    min(CAST(epoch_us(ts) // $usPerDay AS BIGINT)) AS fday
         |  FROM events GROUP BY user_id),
         |cs AS (SELECT fday AS cohort, count(*) AS n_users
         |       FROM fu GROUP BY fday),
         |p AS (
         |  SELECT fu.fday AS cohort,
         |    CAST(epoch_us(e.ts) // $usPerDay AS BIGINT) - fu.fday
         |      AS offset_d,
         |    CAST(sum(CAST(floor(e.value*100 + 0.5) AS BIGINT)) AS BIGINT)
         |      AS cents
         |  FROM events e JOIN fu ON e.user_id = fu.user_id
         |  WHERE e.event_type = 'purchase'
         |  GROUP BY 1, 2),
         |c AS (
         |  SELECT cohort, offset_d, cents,
         |    CAST(sum(cents) OVER (PARTITION BY cohort ORDER BY offset_d
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_cents
         |  FROM p)
         |SELECT c.cohort, c.offset_d, c.cum_cents,
         |  CAST(cs.n_users AS BIGINT) AS n_users,
         |  CAST(c.cum_cents // cs.n_users AS BIGINT)
         |    AS ltv_cents_per_user,
         |  CAST(c.cum_cents AS DOUBLE) / cs.n_users / 100.0
         |    AS ltv_per_user
         |FROM c JOIN cs ON c.cohort = cs.cohort""".stripMargin))(
      (s, d) => {
        val day = (unix_micros(col("ts")).cast("bigint") / usPerDay)
          .cast("bigint")
        val ev = Tables(s, d, "events")
        val fu = ev.groupBy(col("user_id")).agg(min(day).as("fday"))
        val cs = fu.groupBy(col("fday").as("cohort"))
          .agg(count(lit(1)).as("n_users"))
        val p = ev.where(col("event_type") === "purchase")
          .join(fu, "user_id")
          .groupBy(col("fday").as("cohort"), (day - col("fday")).as("offset_d"))
          .agg(sum(floor(col("value") * 100 + 0.5).cast("bigint"))
            .cast("bigint").as("cents"))
        val w = Window.partitionBy(col("cohort")).orderBy(col("offset_d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        p.withColumn("cum_cents", sum(col("cents")).over(w).cast("bigint"))
          .join(cs.select(col("cohort").as("csc"), col("n_users")),
            col("cohort") === col("csc"))
          .select(col("cohort"), col("offset_d"), col("cum_cents"),
            col("n_users").cast("bigint").as("n_users"),
            expr("CAST(cum_cents DIV n_users AS BIGINT)")
              .as("ltv_cents_per_user"),
            (col("cum_cents").cast("double") / col("n_users") / 100.0)
              .as("ltv_per_user"))
      }),

    // ---- stickiness (DAU/WAU): daily distinct users over the rolling
    // 7-day distinct — the engagement-frequency ratio. Composes the
    // WAU cover-explode with a plain daily distinct on one scan
    // lineage; the ratio is exact integer millionths (both operands
    // non-negative, so floor `//` == truncating DIV) plus one double
    // division for the human-readable form — DAU ≤ WAU by
    // construction, so the ratio is bounded in (0, 1]. ----
    QueryDef("q_events_stickiness", Some(
      s"""WITH ud AS (
         |  SELECT DISTINCT user_id,
         |    CAST(epoch_us(ts) // $usPerDay AS BIGINT) AS day
         |  FROM events),
         |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ud),
         |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
         |cover AS (
         |  SELECT DISTINCT user_id, day + o.o AS rday
         |  FROM ud, unnest(range(0, 7)) AS o(o)),
         |wau AS (
         |  SELECT cover.rday AS day, count(*) AS wau
         |  FROM cover, b WHERE cover.rday BETWEEN b.mn AND b.mx
         |  GROUP BY cover.rday)
         |SELECT dau.day, CAST(dau.dau AS BIGINT) AS dau,
         |  CAST(wau.wau AS BIGINT) AS wau,
         |  CAST((dau.dau * 1000000) // wau.wau AS BIGINT)
         |    AS stickiness_e6,
         |  CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
         |FROM dau JOIN wau ON dau.day = wau.day""".stripMargin))(
      (s, d) => {
        val ud = Tables(s, d, "events")
          .select(col("user_id"),
            (unix_micros(col("ts")).cast("bigint") / usPerDay).cast("bigint")
              .as("day"))
          .distinct()
        val b = ud.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
        val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
        val wau = ud
          .select(col("user_id"),
            explode(expr("sequence(day, day + 6)")).as("rday"))
          .distinct()
          .crossJoin(broadcast(b))
          .where(col("rday").between(col("mn"), col("mx")))
          .groupBy(col("rday")).agg(count(lit(1)).as("wau"))
        dau.join(wau, col("day") === col("rday"))
          .select(col("day"), col("dau").cast("bigint").as("dau"),
            col("wau").cast("bigint").as("wau"),
            expr("CAST((dau * 1000000) DIV wau AS BIGINT)")
              .as("stickiness_e6"),
            (col("dau").cast("double") / col("wau")).as("stickiness"))
      }),

    // ---- two-sample Kolmogorov–Smirnov: the distribution-drift test
    // between two samples (here click vs purchase order values) —
    // D = max over thresholds of |F1(v) − F2(v)|, computed EXACTLY as
    // max |n2·cum1(v) − n1·cum2(v)| over the distinct-value grid, so
    // the statistic's numerator is an oracled BIGINT (n1·n2 ≤ 2^63
    // far beyond fixture scale) and the only FP op is one final
    // division. ks_at_sc = the smallest threshold attaining the max
    // (deterministic argmax). Scale: per-value histogram (one map-side
    // -combined shuffle), then the sharded two-phase cumsum from
    // q_eval_auc — window parallelism scales with the value range;
    // no corpus-sized global sort. ----
    QueryDef("q_events_ks_test", Some(
      """WITH t AS (
        |  SELECT CAST(floor(value*100 + 0.5) AS BIGINT) AS sc,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS in1,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS in2
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |g AS (SELECT sc, CAST(sum(in1) AS BIGINT) AS c1,
        |        CAST(sum(in2) AS BIGINT) AS c2 FROM t GROUP BY sc),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |        CAST(sum(c2) AS BIGINT) AS n2 FROM g),
        |r AS (SELECT sc,
        |        sum(c1) OVER (ORDER BY sc) AS cum1,
        |        sum(c2) OVER (ORDER BY sc) AS cum2 FROM g),
        |dev AS (SELECT sc, abs(n.n2*cum1 - n.n1*cum2) AS dnum FROM r, n),
        |m AS (SELECT CAST(max(dnum) AS BIGINT) AS ks_num FROM dev)
        |SELECT n.n1, n.n2, m.ks_num,
        |  (SELECT min(sc) FROM dev WHERE dev.dnum = m.ks_num) AS ks_at_sc,
        |  CAST(m.ks_num AS DOUBLE) / (n.n1 * n.n2) AS ks
        |FROM n, m""".stripMargin))(
      (s, d) => {
        val t = Tables(s, d, "events")
          .where(col("event_type").isin("click", "purchase"))
          .select(floor(col("value") * 100 + 0.5).cast("bigint").as("sc"),
            when(col("event_type") === "click", 1L).otherwise(0L).as("in1"),
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("in2"))
        val g = t.groupBy(col("sc"))
          .agg(sum(col("in1")).cast("bigint").as("c1"),
            sum(col("in2")).cast("bigint").as("c2"))
          .withColumn("shard", expr("sc DIV 4096"))
          .persist() // totals + two-phase cumsum below share it
        val n = g.agg(sum(col("c1")).cast("bigint").as("n1"),
          sum(col("c2")).cast("bigint").as("n2"))
        // two-phase cumsum: within-shard window + broadcast offsets
        val wLoc = Window.partitionBy(col("shard")).orderBy(col("sc"))
        val local = g
          .withColumn("l1", sum(col("c1")).over(wLoc))
          .withColumn("l2", sum(col("c2")).over(wLoc))
        val wSh = graft.ops.BoundedWindow.ordered(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = g.groupBy(col("shard"))
          .agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2"))
          .withColumn("o1", coalesce(sum(col("t1")).over(wSh), lit(0L)))
          .withColumn("o2", coalesce(sum(col("t2")).over(wSh), lit(0L)))
          .select(col("shard"), col("o1"), col("o2"))
        val dev = local.join(broadcast(offs), "shard")
          .crossJoin(broadcast(n))
          .select(col("sc"), col("n1"), col("n2"),
            abs(col("n2") * (col("l1") + col("o1"))
              - col("n1") * (col("l2") + col("o2"))).as("dnum"))
          .persist() // max + argmax passes
        val m = dev.agg(max(col("dnum")).cast("bigint").as("ks_num"))
        val at = dev.join(broadcast(m), col("dnum") === col("ks_num"))
          .agg(min(col("sc")).as("ks_at_sc"))
        n.crossJoin(broadcast(m)).crossJoin(broadcast(at))
          .select(col("n1"), col("n2"), col("ks_num"), col("ks_at_sc"),
            (col("ks_num").cast("double") / (col("n1") * col("n2")))
              .as("ks"))
      }),

    // ---- CUSUM change-point monitor over the daily revenue series:
    // the classic drift alarm S_i = max(0, S_{i−1} + (x_i − μ)),
    // computed WINDOW-EXPRESSIBLY via the prefix identity
    // S_i = cum_i − min(0, min_{j≤i} cum_j) where cum is the running
    // sum of deviations. Everything stays exact: deviations are
    // multiplied through by n_days (dvn = n·x_i − Σx, integer cents·n)
    // so the mean never becomes a float; the alarm threshold 2·mean
    // becomes cusum_n > 2·Σx in the same scaled space. The one FP op
    // is the readable cusum_cents division. Scale: the windows run on
    // the DAY-grain frame (bounded at 366 rows/year regardless of
    // corpus size — the aggregate shrinks the data before any sort). ----
    QueryDef("q_events_cusum", Some(
      s"""WITH daily AS (
         |  SELECT CAST(epoch_us(ts) // $usPerDay AS BIGINT) AS day,
         |    CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT)
         |      AS x
         |  FROM events WHERE event_type = 'purchase'
         |  GROUP BY CAST(epoch_us(ts) // $usPerDay AS BIGINT)),
         |tot AS (SELECT CAST(sum(x) AS BIGINT) AS sx,
         |          CAST(count(*) AS BIGINT) AS nd FROM daily),
         |c AS (
         |  SELECT day, x, tot.sx, tot.nd,
         |    sum(tot.nd * x - tot.sx) OVER (ORDER BY day) AS cum
         |  FROM daily, tot),
         |r AS (
         |  SELECT day, x, sx, nd, cum,
         |    cum - least(CAST(0 AS BIGINT), min(cum) OVER (ORDER BY day))
         |      AS cusum_n
         |  FROM c)
         |SELECT day, x AS cents, CAST(cum AS BIGINT) AS cum_n,
         |  CAST(cusum_n AS BIGINT) AS cusum_n,
         |  CAST(cusum_n AS DOUBLE) / nd AS cusum_cents,
         |  (cusum_n > 2 * sx) AS alarm
         |FROM r""".stripMargin))(
      (s, d) => {
        val daily = Tables(s, d, "events")
          .where(col("event_type") === "purchase")
          .groupBy((unix_micros(col("ts")).cast("bigint") / usPerDay)
            .cast("bigint").as("day"))
          .agg(sum(floor(col("value") * 100 + 0.5).cast("bigint"))
            .cast("bigint").as("x"))
        val tot = daily.agg(sum(col("x")).cast("bigint").as("sx"),
          count(lit(1)).as("nd"))
        val w = graft.ops.BoundedWindow.ordered(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.crossJoin(broadcast(tot))
          .withColumn("cum", sum(col("nd") * col("x") - col("sx")).over(w))
          .withColumn("cusum_n",
            col("cum") - least(lit(0L), min(col("cum")).over(w)))
          .select(col("day"), col("x").as("cents"),
            col("cum").cast("bigint").as("cum_n"),
            col("cusum_n").cast("bigint").as("cusum_n"),
            (col("cusum_n").cast("double") / col("nd")).as("cusum_cents"),
            (col("cusum_n") > lit(2) * col("sx")).as("alarm"))
      }),

    // ---- Markov stationary distribution of the event-type chain:
    // the row-stochastic transition matrix (same per-user lag
    // construction as q_events_transitions, '<start>' excluded) in
    // 1e9-scaled integer probabilities, then THREE power-iteration
    // steps from a uniform 1e6-mass start — π·P iterated as a
    // |states|²-row broadcast join + hash-agg, every step exact
    // integer ((Σ πᵢ·pᵢⱼ) DIV 1e9; magnitudes ≤ 5e15, int64 holds).
    // The converged π is the "where do users spend their time"
    // statistic behind session simulators and load models. Scale:
    // ONE corpus-sized window pass builds the counts; every
    // iteration after that touches |types|² rows regardless of data
    // size. ----
    QueryDef("q_events_markov_stationary", Some {
      def step(prev: String, out: String) =
        s"""$out AS (
           |  SELECT p.next_type AS st,
           |    CAST(CAST(sum($prev.pi * p.p_scaled) AS BIGINT)
           |      // 1000000000 AS BIGINT) AS pi
           |  FROM p JOIN $prev ON p.prev_type = $prev.st
           |  GROUP BY p.next_type)""".stripMargin
      s"""WITH s AS (
         |  SELECT user_id, event_type,
         |    lag(event_type) OVER (PARTITION BY user_id
         |      ORDER BY epoch_us(ts), event_id) AS prev_type
         |  FROM events),
         |t AS (SELECT prev_type, event_type AS next_type, count(*) AS n
         |      FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2),
         |r AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot
         |      FROM t GROUP BY 1),
         |p AS (SELECT t.prev_type, t.next_type,
         |        (1000000000 * t.n) // r.tot AS p_scaled
         |      FROM t JOIN r ON t.prev_type = r.prev_type),
         |pi0 AS (SELECT DISTINCT next_type AS st,
         |          CAST(1000000 AS BIGINT) AS pi FROM t),
         |${step("pi0", "pi1")},
         |${step("pi1", "pi2")},
         |${step("pi2", "pi3")}
         |SELECT st AS state, pi AS pi3_scaled FROM pi3""".stripMargin
    })(
      (s, d) => {
        val wUser = Window.partitionBy(col("user_id"))
          .orderBy(unix_micros(col("ts")), col("event_id"))
        val t = Tables(s, d, "events")
          .select(col("user_id"), col("event_type"),
            lag(col("event_type"), 1).over(wUser).as("prev"))
          .where(col("prev").isNotNull)
          .groupBy(col("prev").as("prev_type"),
            col("event_type").as("next_type"))
          .agg(count(lit(1)).as("n"))
          .persist() // row totals + states + the matrix all read it
        val r = t.groupBy(col("prev_type")).agg(sum(col("n")).as("tot"))
        val p = t.join(r, "prev_type")
          .select(col("prev_type"), col("next_type"),
            expr("(1000000000 * n) DIV tot").as("p_scaled"))
          .localCheckpoint(true) // read by all three iterations
        var pi = t.select(col("next_type").as("st")).distinct()
          .select(col("st"), lit(1000000L).as("pi"))
        for (_ <- 1 to 3) {
          pi = p.join(pi.select(col("st").as("prev_type"), col("pi")),
              "prev_type")
            .groupBy(col("next_type").as("st"))
            .agg(expr("CAST(CAST(sum(pi * p_scaled) AS BIGINT)" +
              " DIV 1000000000 AS BIGINT)").as("pi"))
        }
        pi.select(col("st").as("state"), col("pi").as("pi3_scaled"))
      }),

    // ---- burst-episode detection: per event type, maximal runs of
    // consecutive ABOVE-AVERAGE days (threshold = the type's daily
    // mean, integer cross-multiplied n·nd > tot — no division) with
    // episode start/end/length/peak/total — the activity-surge report
    // behind capacity planning and anomaly triage, via the
    // gaps-and-islands identity (day − row_number over in-burst days
    // is constant within an episode). Scale: one corpus-sized
    // (type, day) hash-agg; every window after runs at day grain,
    // bounded by 366 rows per type-year regardless of event count. ----
    QueryDef("q_events_bursts", Some(
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot,
        |        count(*) AS nd
        |      FROM daily GROUP BY 1),
        |f AS (SELECT d.event_type, d.day, d.n
        |      FROM daily d JOIN m ON d.event_type = m.event_type
        |      WHERE d.n * m.nd > m.tot),
        |g AS (SELECT event_type, day, n,
        |        day - row_number() OVER (PARTITION BY event_type
        |          ORDER BY day) AS grp
        |      FROM f)
        |SELECT event_type, min(day) AS start_day, max(day) AS end_day,
        |  count(*) AS len_days, CAST(max(n) AS BIGINT) AS peak,
        |  CAST(sum(n) AS BIGINT) AS total_events
        |FROM g GROUP BY event_type, grp""".stripMargin))(
      (s, d) => {
        val daily = Tables(s, d, "events")
          .groupBy(col("event_type"),
            expr("unix_micros(ts) DIV 86400000000").as("day"))
          .agg(count(lit(1)).as("n"))
        val m = daily.groupBy(col("event_type"))
          .agg(sum(col("n")).as("tot"), count(lit(1)).as("nd"))
        val f = daily.join(m, "event_type")
          .where(col("n") * col("nd") > col("tot"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        f.withColumn("grp", col("day") - row_number().over(w))
          .groupBy(col("event_type"), col("grp"))
          .agg(min(col("day")).as("start_day"),
            max(col("day")).as("end_day"),
            count(lit(1)).as("len_days"),
            max(col("n")).cast("bigint").as("peak"),
            sum(col("n")).cast("bigint").as("total_events"))
          .drop("grp")
      }),

    // ---- index of dispersion (variance-to-mean ratio) of daily
    // counts per event type: the Poisson overdispersion test — a
    // Poisson arrival process has D = 1; D ≫ 1 means bursty/clumped
    // arrivals (retries, bot storms), D ≪ 1 means rate-limited. With
    // daily counts nᵢ over nd days, D = (nd·Σn² − tot²)/(nd·tot)
    // exactly — emitted 1e6-scaled, one integer division, flag at
    // D > 2. Scale: one (type, day) hash-agg over the corpus, then
    // per-type scalar arithmetic on ≤ 366 rows/type. ----
    QueryDef("q_events_dispersion", Some(
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, count(*) AS nd,
        |  CAST(sum(n) AS BIGINT) AS tot,
        |  CAST((1000000 * (count(*) * sum(n * n) - sum(n) * sum(n)))
        |    // (count(*) * sum(n)) AS BIGINT) AS dispersion_e6,
        |  (1000000 * (count(*) * sum(n * n) - sum(n) * sum(n)))
        |    // (count(*) * sum(n)) > 2000000 AS overdispersed
        |FROM daily GROUP BY event_type""".stripMargin))(
      (s, d) => {
        // tot² through DECIMAL(38,0): long² wraps once daily totals
        // reach ~3e9 (plausible at 100 TB); the oracle's HUGEINT
        // widens automatically
        val de6 = expr("(1000000 * (nd * s2 -" +
          " CAST(tot AS DECIMAL(38,0)) * tot)) DIV (nd * tot)")
        Tables(s, d, "events")
          .groupBy(col("event_type"),
            expr("unix_micros(ts) DIV 86400000000").as("day"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("nd"), sum(col("n")).as("tot"),
            sum((col("n") * col("n")).cast("decimal(38,0)")).as("s2"))
          .select(col("event_type"), col("nd"), col("tot"),
            de6.cast("bigint").as("dispersion_e6"),
            (de6 > 2000000L).as("overdispersed"))
      }),

    // ---- multiplicative seasonal index per (event type, weekday):
    // mean daily volume on that weekday over the type's overall daily
    // mean, exact by cross-multiplication — 1e6 means "an average
    // Monday". Weekday = epoch-day mod 7 (a rotation of the calendar
    // weekday — constant offset, irrelevant to the index). This is
    // the deseasonalization table q_events_seasonal_naive implies:
    // divide a day's count by its index_e6 to compare across
    // weekdays. The 1e6·s_dow·nd_all product is widened to
    // HUGEINT/DECIMAL(38,0) (daily sums at 100 TB push the int64
    // line). Scale: one (type, day) corpus agg; everything after is
    // ≤ 7 rows per type. ----
    QueryDef("q_events_seasonal_index", Some(
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |dw AS (SELECT event_type, day % 7 AS dow, count(*) AS nd_dow,
        |         CAST(sum(n) AS BIGINT) AS s_dow
        |       FROM daily GROUP BY 1, 2),
        |t AS (SELECT event_type, count(*) AS nd_all,
        |        CAST(sum(n) AS BIGINT) AS s_all
        |      FROM daily GROUP BY 1)
        |SELECT dw.event_type, dw.dow, dw.nd_dow, dw.s_dow,
        |  CAST((CAST(1000000 AS HUGEINT) * dw.s_dow * t.nd_all)
        |    // (dw.nd_dow * t.s_all) AS BIGINT) AS index_e6
        |FROM dw JOIN t ON dw.event_type = t.event_type"""
        .stripMargin))(
      (s, d) => {
        val daily = Tables(s, d, "events")
          .groupBy(col("event_type"),
            expr("unix_micros(ts) DIV 86400000000").as("day"))
          .agg(count(lit(1)).as("n"))
          .persist() // weekday and overall aggs both read it
        val dw = daily
          .groupBy(col("event_type"), (col("day") % 7).as("dow"))
          .agg(count(lit(1)).as("nd_dow"), sum(col("n")).as("s_dow"))
        val t = daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("nd_all"), sum(col("n")).as("s_all"))
        dw.join(broadcast(t), "event_type")
          .select(col("event_type"), col("dow"), col("nd_dow"),
            col("s_dow"),
            expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * s_dow * nd_all)" +
              " DIV (nd_dow * s_all) AS BIGINT)").as("index_e6"))
      }),

    // ---- Wilson 95% confidence interval on daily view→purchase
    // conversion: the binomial CI that stays inside [0,1] at small n
    // (the normal approximation q_events_ab_test uses for MEANS is
    // wrong for small-count PROPORTIONS). Inputs are exact integers
    // (distinct viewers / converters per day); the interval is one
    // shared arithmetic text over z=1.96 literals (z²=3.8416,
    // z²/2=1.9208, z²/4=0.9604) — ±, ×, ÷ and IEEE-exact sqrt only,
    // identical operation order in both dialects, so even the bounds
    // hash-match. Scale: one (day, user) dedup agg over the corpus,
    // then day-grain arithmetic. ----
    QueryDef("q_events_conversion_ci", Some {
      s"""WITH du AS (
         |  SELECT epoch_us(ts) // 86400000000 AS day, user_id,
         |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS hp
         |  FROM events WHERE event_type IN ('view', 'purchase')
         |  GROUP BY 1, 2),
         |dd AS (
         |  SELECT day, CAST(sum(hv) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN hv = 1 AND hp = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS k
         |  FROM du GROUP BY day),
         |pp AS (SELECT day, n, k, CAST(k AS DOUBLE) / n AS p,
         |         (CAST(2500 AS HUGEINT) * k + 4802) * n AS wa,
         |         n * (CAST(2500 AS HUGEINT) * n + 9604) AS wb,
         |         CAST(2500 AS HUGEINT) * n * k * (n - k)
         |           + CAST(2401 AS HUGEINT) * n * n AS wd
         |       FROM dd WHERE n >= 1)
         |SELECT day, n, k, p,
         |  ${wilsonSql("lo", "-")} AS wilson_lo,
         |  ${wilsonSql("hi", "+")} AS wilson_hi
         |FROM pp""".stripMargin
    })(
      (s, d) => {
        val du = Tables(s, d, "events")
          .where(col("event_type").isin("view", "purchase"))
          .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"),
            col("user_id"))
          .agg(max(when(col("event_type") === "view", 1).otherwise(0))
            .as("hv"),
            max(when(col("event_type") === "purchase", 1).otherwise(0))
              .as("hp"))
        du.groupBy(col("day"))
          .agg(sum(col("hv")).as("n"),
            sum(when(col("hv") === 1 && col("hp") === 1, 1).otherwise(0))
              .as("k"))
          .where(col("n") >= 1)
          .select(col("day"), col("n"), col("k"),
            (col("k").cast("double") / col("n")).as("p"),
            // widened to DECIMAL(38,0)/HUGEINT: wd ~ 2500·n³ passes
            // the int64 line at n ≈ 1.5e5 distinct daily viewers
            expr("(CAST(2500 AS DECIMAL(38,0)) * k + 4802) * n").as("wa"),
            expr("n * (CAST(2500 AS DECIMAL(38,0)) * n + 9604)").as("wb"),
            expr("CAST(2500 AS DECIMAL(38,0)) * n * k * (n - k)" +
              " + CAST(2401 AS DECIMAL(38,0)) * n * n").as("wd"))
          .select(col("day"), col("n"), col("k"), col("p"),
            expr(wilsonSql("lo", "-")).as("wilson_lo"),
            expr(wilsonSql("hi", "+")).as("wilson_hi"))
      }),

    // ---- Theil–Sen robust trend per event type: the MEDIAN of all
    // pairwise daily-total slopes — the estimator that shrugs off the
    // outlier days OLS (q_events_rolling_slope) chases. Slopes are
    // exact integers ((1e6·Δcents) DIV Δdays), and the median is the
    // same histogram-rank shape as q_agg_mad (2·cum ≥ tot over
    // per-(type, slope) counts). Scale: the pair join runs at DAY
    // grain — ≤ 366 rows/type/year regardless of event volume, so
    // the ~67k slope pairs per type-year are a constant; the only
    // corpus-sized stage is the daily aggregate. ----
    QueryDef("q_events_theil_sen", Some(
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |sl AS (
        |  SELECT a.event_type,
        |    (1000000 * (b.cents - a.cents)) // (b.day - a.day) AS s
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day),
        |h AS (SELECT event_type, s, count(*) AS w FROM sl GROUP BY 1, 2),
        |r AS (SELECT event_type, s,
        |        CAST(sum(w) OVER (PARTITION BY event_type ORDER BY s)
        |          AS BIGINT) AS cum,
        |        CAST(sum(w) OVER (PARTITION BY event_type) AS BIGINT)
        |          AS tot
        |      FROM h)
        |SELECT event_type, CAST(min(tot) AS BIGINT) AS n_pairs,
        |  CAST(min(CASE WHEN 2 * cum >= tot THEN s END) AS BIGINT)
        |    AS median_slope_e6
        |FROM r GROUP BY event_type""".stripMargin))(
      (s, d) => {
        val daily = Tables(s, d, "events")
          .groupBy(col("event_type"),
            expr("unix_micros(ts) DIV 86400000000").as("day"))
          .agg(sum(floor(col("value") * 100 + 0.5).cast("bigint"))
            .cast("bigint").as("cents"))
          .persist() // both sides of the pair join
        val sl = daily.alias("a")
          .join(daily.alias("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.day") < col("b.day"))
          .select(col("a.event_type").as("event_type"),
            // slopes are SIGNED — safe here because BOTH integer
            // divisions truncate toward zero (DuckDB `//` is C-style
            // truncation, verified: (-1539000000)//17 = -90529411
            // with remainder -13; Spark DIV matches)
            expr("(1000000 * (b.cents - a.cents)) DIV (b.day - a.day)")
              .as("s"))
        val h = sl.groupBy(col("event_type"), col("s"))
          .agg(count(lit(1)).as("w"))
        val wOrd = Window.partitionBy(col("event_type")).orderBy(col("s"))
        val wAll = Window.partitionBy(col("event_type"))
        h.withColumn("cum", sum(col("w")).over(wOrd))
          .withColumn("tot", sum(col("w")).over(wAll))
          .groupBy(col("event_type"))
          .agg(min(col("tot")).cast("bigint").as("n_pairs"),
            min(when(lit(2) * col("cum") >= col("tot"), col("s")))
              .cast("bigint").as("median_slope_e6"))
      })
  )
}
