package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a Spark query over the fixture dir,
  * optionally paired with an ANSI-SQL twin the driver executes in DuckDB
  * over the same parquet tables (hash-compared at sf0.01 — see
  * /root/repo/BASELINE.json).
  *
  * Parity rules used throughout the catalog (Spark <-> DuckDB):
  *  - sums/avgs over money columns go through DECIMAL(18,2) (the data is
  *    exact 2-decimal; decimal arithmetic is exact in both engines), then
  *    CAST to DOUBLE at the end — bit-identical results.
  *  - timestamps are emitted as `unix_micros` <-> `epoch_us` BIGINT
  *    (avoids timezone / sub-second rounding divergence).
  *  - no transcendental functions except IEEE-exact `sqrt`; no `round`
  *    on data-derived doubles (HALF_UP vs HALF_EVEN divergence).
  *  - SIGNED integer division is parity-safe as-is: DuckDB `//` is
  *    C-style truncation toward zero, NOT floor ((-1539000000)//17 =
  *    -90529411 with remainder -13 — verified), matching Spark `DIV`
  *    exactly. Do NOT "fix" a signed DIV with the pmod floor identity
  *    — that breaks parity (the q_events_theil_sen lesson).
  *  - every computed column is aliased identically on both sides (the
  *    driver sorts columns by name before hashing).
  *
  * `effectful`: invoking `fn` RUNS a real job (stages files, executes a
  * streaming query, drives the pipeline) rather than merely declaring a
  * lazy plan. Catalog-wide *plan construction* sweeps (PlanGuardSpec,
  * PlanAudit, any explain-only tooling) must skip these — their "plan"
  * is just the read of an already-produced output, and building it
  * costs a full run. Verify/Bench still execute them normally.
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    headline: Boolean = false,
    effectful: Boolean = false)(
    val fn: (SparkSession, String) => DataFrame)

object QueryDef {

  /** Resolve a composed entry's dependency by name with a descriptive
    * failure: these lookups run at object initialization, where a bare
    * `.get` NoSuchElementException would break construction of the
    * ENTIRE dependent catalog object, with no hint of which rename
    * caused it. */
  def requireDef(defs: Seq[QueryDef], name: String, forQuery: String): QueryDef =
    defs.find(_.name == name).getOrElse(sys.error(
      s"$forQuery composes $name, which is no longer in the catalog"))

  /** [[requireDef]] for the dependency's oracle SQL. */
  def requireOracle(defs: Seq[QueryDef], name: String, forQuery: String): String =
    requireDef(defs, name, forQuery).oracle.getOrElse(sys.error(
      s"$forQuery composes the oracle of $name, which has been removed"))
}
