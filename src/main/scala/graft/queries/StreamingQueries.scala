package graft.queries

import graft.{QueryDef, Tables}
import graft.streaming.EventStream

/** Batch twins of the streaming transforms, oracled against DuckDB —
  * the SAME expressions run under readStream (StreamingSpec verifies
  * stream/batch equivalence; here the batch semantics are gated).
  * Window start is epoch-floor arithmetic in the oracle (identical to
  * Spark's window() for epoch-aligned tumbling windows, UTC).
  */
object StreamingQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_stream_window_batch", Some(
      """SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS window_start_us,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin), headline = true)(
      (s, d) =>
        EventStream.windowedAgg(Tables(s, d, "events"))
          .drop("approx_users")) // sketch values are engine-specific
  )
}
