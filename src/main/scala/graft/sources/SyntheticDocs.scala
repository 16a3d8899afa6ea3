package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util

/** DataSource V2 batch source generating a deterministic synthetic
  * document corpus — the "any-scale-factor bench input without
  * staging files" source (the reference's only inputs are JDBC +
  * files; a DSv2 TableProvider is the Spark-native way to add a new
  * one, and THE extension point this engine's source layer plugs
  * into). Rows are pure arithmetic on `doc_id`, so an external SQL
  * engine can reproduce the corpus from a `range()` — the DuckDB
  * oracle gates the source end to end, not just row counts.
  *
  * Scale design:
  *  - `partitions` readers generate disjoint doc_id stripes in
  *    parallel — 100 TB is a number, not a staging job; no driver-side
  *    row materialization anywhere.
  *  - Column pruning is REAL: the reader materializes only the fields
  *    Spark asks for (SupportsPushDownRequiredColumns), so
  *    `select(count)` pays for no string building — asserted by spec
  *    on the executed scan's readSchema.
  *  - doc_id range predicates are FULLY pushed
  *    (SupportsPushDownFilters): stripes are planned inside the
  *    bounds and the residual Filter disappears from the executed
  *    plan — asserted by spec.
  *  - global count/min/max over doc_id arithmetic is COMPLETELY
  *    pushed (SupportsPushDownAggregates): one closed-form row, no
  *    generation, no aggregate node in the plan.
  *  - LIMIT and ORDER BY doc_id LIMIT are FULLY pushed
  *    (SupportsPushDownLimit / SupportsPushDownTopN): the scan
  *    narrows to the first/last n of the range, emitted in the
  *    requested order.
  *  - The MICRO-BATCH path (readStream on the same format) tracks the
  *    doc_id position as its offset with admission-controlled pacing
  *    (`rowsPerTrigger`), each delta planned as parallel stripes —
  *    the V2 streaming-source extension point, gated end to end by
  *    the same range() oracle (q_stream_dsv2_source_run).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.SyntheticDocs")
  *     .option("rows", 100000).option("partitions", 8).load()
  *   spark.readStream.format("graft.sources.SyntheticDocs")
  *     .option("rows", 100000).option("rowsPerTrigger", 25000).load()
  * }}}
  */
class SyntheticDocs extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // DSv2 options are nominally case-insensitive; an exact-key lookup
    // would silently ignore a caller's "rowsPerTrigger" vs
    // "rowspertrigger" and fall back to the default
    val opts = new CaseInsensitiveStringMap(properties)
    new SyntheticDocs.SynTable(
      opts.getLong("rows", 1000L),
      opts.getInt("partitions", 4),
      opts.getLong("rowsPerTrigger", 25000L))
  }
}

object SyntheticDocs {

  /** doc_id PK; every other column is total arithmetic on it. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("ts_us", LongType, nullable = false),
    StructField("cents", LongType, nullable = false),
    StructField("lang", StringType, nullable = false)))

  private val langs = Array("en", "de", "fr", "ja")

  /** ts_us generation formula — ONE definition shared by the row
    * writer and the pushed min/max(ts_us) closed forms, so the
    * completely-pushed aggregate can never silently disagree with the
    * rows it claims to summarize. */
  private def tsOf(i: Long): Long = 1704067200000000L + i * 1000000L

  private[sources] final class SynTable(rows: Long, partitions: Int,
      rowsPerTrigger: Long) extends Table with SupportsRead {
    override def name(): String = s"synthetic_docs($rows)"
    override def schema(): StructType = SyntheticDocs.schema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.MICRO_BATCH_READ)
    override def newScanBuilder(
        options: CaseInsensitiveStringMap): ScanBuilder =
      new SynScanBuilder(rows, partitions, rowsPerTrigger)
  }

  private final class SynScanBuilder(rows: Long, partitions: Int,
      rowsPerTrigger: Long)
      extends ScanBuilder with SupportsPushDownRequiredColumns
      with org.apache.spark.sql.connector.read.SupportsPushDownFilters
      with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
      with org.apache.spark.sql.connector.read.SupportsPushDownLimit
      with org.apache.spark.sql.connector.read.SupportsPushDownTopN {
    import org.apache.spark.sql.sources._
    private var required: StructType = SyntheticDocs.schema
    private var accepted: Array[Filter] = Array.empty
    private var pushedAgg: Option[(Boolean, Seq[AggSpec])] = None
    private var pushedLimit: Option[Int] = None
    private var pushedTopNDesc: Option[(Int, Boolean)] = None
    private var lo = 0L
    private var hi = rows

    /** LIMIT n is FULLY pushed: any n rows satisfy a bare limit, so
      * the scan narrows to the first n of the (already filter-pushed)
      * range and plans ONE stripe — Spark drops its own Limit. n is
      * small by the nature of a pushed limit, so losing stripe
      * parallelism is the right trade (a trillion-row `LIMIT 10`
      * generates 10 rows, not one stripe's worth).
      *
      * REFUSED once an aggregate is pushed: Spark pushes aggregates
      * before limits, and a completely-pushed aggregate scan answers
      * from closed form — it cannot also narrow to "first n" of
      * anything. Accepting here would let Spark drop its own Limit
      * (isPartiallyPushed=false) over agg output it never limited —
      * silent wrong results for `groupBy(...).agg(...).limit(n)`. */
    override def pushLimit(limit: Int): Boolean = {
      if (pushedAgg.isDefined) false
      else { pushedLimit = Some(limit); true }
    }

    // both limit and topN pushes are EXACT (the scan emits precisely
    // the requested window, in order for topN), so Spark may drop its
    // own Limit/Sort — the Java default in both parent interfaces,
    // made explicit because Scala requires disambiguation
    override def isPartiallyPushed(): Boolean = false

    /** ORDER BY doc_id [ASC|DESC] LIMIT n is FULLY pushed: doc_id is
      * the generation order, so the top-n window is a closed-form
      * sub-range — [lo, lo+n) ascending, [hi-n, hi) descending, the
      * reader emitting rows IN the requested order (one stripe; Spark
      * eliminates both the Sort and the Limit). Any other sort column
      * is refused (the generator's order proves nothing about it).
      * Refused outright over a pushed aggregate — same hazard as
      * pushLimit: the closed-form agg scan can't honor a row window. */
    override def pushTopN(
        orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
        limit: Int): Boolean = {
      import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection}
      if (pushedAgg.isDefined) return false
      orders.toSeq match {
        case Seq(o) => o.expression() match {
          case nr: NamedReference
              if nr.fieldNames.toSeq == Seq("doc_id") =>
            pushedTopNDesc =
              Some((limit, o.direction() == SortDirection.DESCENDING))
            true
          case _ => false
        }
        case _ => false
      }
    }
    override def pruneColumns(requiredSchema: StructType): Unit =
      // empty projections (pure count) keep zero fields — honor that.
      // once an aggregation is pushed the scan's output IS the agg
      // schema; a later pruning call (which would carry agg output
      // attributes, not source fields) must not clobber it
      if (pushedAgg.isEmpty) required = requiredSchema

    /** COMPLETE aggregate pushdown: count / min / max over columns
      * whose extremes are pure arithmetic on the scan's [lo, hi)
      * doc_id bounds is answered from the bounds alone — zero rows
      * generated, however large `rows` is (the spec proves it by
      * aggregating a 10^12-row corpus instantly). Only aggregates
      * this source can answer EXACTLY are accepted: count(*) /
      * count(col) (every column is non-null); count(DISTINCT doc_id)
      * (the PK); min/max of doc_id and the strictly monotone ts_us.
      * GROUP BY lang is ALSO complete: lang = doc_id mod 4, so each
      * group is a residue class of the range and its count/min/max
      * are closed-form too — the scan emits at most four group rows.
      * Anything else — min/max of the other modular columns, sums,
      * avg, other group keys — returns false and Spark keeps its own
      * aggregate. Complete (not partial) pushdown: ONE partition
      * emits the final row(s) and Spark plans NO aggregate node. */
    override def supportCompletePushDown(
        agg: org.apache.spark.sql.connector.expressions.aggregate
          .Aggregation): Boolean = translateAgg(agg).isDefined

    override def pushAggregation(
        agg: org.apache.spark.sql.connector.expressions.aggregate
          .Aggregation): Boolean =
      translateAgg(agg) match {
        case s @ Some(_) => pushedAgg = s; true
        case None => false
      }

    private def translateAgg(
        agg: org.apache.spark.sql.connector.expressions.aggregate
          .Aggregation): Option[(Boolean, Seq[AggSpec])] = {
      import org.apache.spark.sql.connector.expressions.NamedReference
      import org.apache.spark.sql.connector.expressions.aggregate._
      def field(e: org.apache.spark.sql.connector.expressions.Expression)
          : Option[String] = e match {
        case nr: NamedReference if nr.fieldNames.length == 1 =>
          Some(nr.fieldNames()(0))
        case _ => None
      }
      val grouped = agg.groupByExpressions.toSeq match {
        case Seq() => Some(false)
        case Seq(e) if field(e).contains("lang") => Some(true)
        case _ => None
      }
      if (grouped.isEmpty) return None
      val specs = agg.aggregateExpressions.map {
        case _: CountStar => Some(RowCountSpec)
        case c: Count if !c.isDistinct && field(c.column).isDefined =>
          Some(RowCountSpec) // all columns are non-null by schema
        case c: Count if c.isDistinct && field(c.column).contains("doc_id") =>
          Some(RowCountSpec) // doc_id is the PK: distinct == count
        case m: Min => field(m.column) match {
          case Some("doc_id") => Some(MinDocSpec)
          case Some("ts_us") => Some(MinTsSpec)
          case _ => None
        }
        case m: Max => field(m.column) match {
          case Some("doc_id") => Some(MaxDocSpec)
          case Some("ts_us") => Some(MaxTsSpec)
          case _ => None
        }
        case _ => None
      }
      if (specs.nonEmpty && specs.forall(_.isDefined))
        Some((grouped.get, specs.toSeq.flatten: Seq[AggSpec]))
      else None
    }

    /** doc_id range bounds are FULLY pushed (no residual re-filter —
      * the generator simply never produces out-of-range ids, and the
      * planner prunes whole stripes); anything else stays Spark's. */
    override def pushFilters(filters: Array[Filter]): Array[Filter] = {
      // integral widths only: accepting a fractional bound and
      // truncating would drop/include boundary rows with NO residual
      // Filter left to correct it (the bounds are reported fully
      // pushed) — a fractional comparison stays Spark's to evaluate
      def long(v: Any): Option[Long] = v match {
        case n: java.lang.Long => Some(n.longValue)
        case n: java.lang.Integer => Some(n.longValue)
        case n: java.lang.Short => Some(n.longValue)
        case n: java.lang.Byte => Some(n.longValue)
        case _ => None
      }
      val (ours, residual) = filters.partition {
        case GreaterThan("doc_id", v) => long(v).isDefined
        case GreaterThanOrEqual("doc_id", v) => long(v).isDefined
        case LessThan("doc_id", v) => long(v).isDefined
        case LessThanOrEqual("doc_id", v) => long(v).isDefined
        case EqualTo("doc_id", v) => long(v).isDefined
        case _ => false
      }
      // saturating +1: at Long.MaxValue a wrapping increment would
      // silently invert the bound (> MaxValue -> all rows instead of
      // none) with no residual Filter left to catch it
      def inc(v: Long): Long =
        if (v == Long.MaxValue) Long.MaxValue else v + 1
      ours.foreach {
        case GreaterThan(_, v) => lo = math.max(lo, inc(long(v).get))
        case GreaterThanOrEqual(_, v) => lo = math.max(lo, long(v).get)
        case LessThan(_, v) => hi = math.min(hi, long(v).get)
        case LessThanOrEqual(_, v) => hi = math.min(hi, inc(long(v).get))
        case EqualTo(_, v) =>
          lo = math.max(lo, long(v).get); hi = math.min(hi, inc(long(v).get))
        case _ => ()
      }
      accepted = ours
      residual
    }
    override def pushedFilters(): Array[Filter] = accepted
    override def build(): Scan = pushedAgg match {
      case Some((grouped, specs)) =>
        new SynAggScan(lo, math.max(lo, hi), specs, grouped)
      case None =>
        val lo0 = lo
        val hi0 = math.max(lo, hi)
        // overflow-safe min(hi0, lo0 + n): lo0 + n can wrap near
        // Long.MaxValue, hi0 - n cannot underflow meaningfully
        def firstN(n: Int): Long = if (lo0 > hi0 - n) hi0 else lo0 + n
        (pushedTopNDesc, pushedLimit) match {
          case (Some((n, desc)), _) =>
            val (l2, h2) =
              if (desc) (math.max(lo0, hi0 - n), hi0)
              else (lo0, firstN(n))
            new SynScan(l2, h2, 1, rowsPerTrigger, required, desc = desc,
              pushedNote = s", pushedTopN=doc_id ${if (desc) "DESC" else "ASC"} n=$n")
          case (None, Some(n)) =>
            new SynScan(lo0, firstN(n), 1, rowsPerTrigger, required,
              pushedNote = s", pushedLimit=$n")
          case (None, None) =>
            new SynScan(lo0, hi0, partitions, rowsPerTrigger, required)
        }
    }
  }

  /** Closed-form summary of a doc_id id-set (the whole range, or one
    * lang residue class of it): enough to answer every accepted
    * aggregate. `minDoc`/`maxDoc` are meaningful only when count>0. */
  private final case class RangeStats(count: Long, minDoc: Long,
      maxDoc: Long)

  /** One pushed-down aggregate column: its output field and its
    * closed-form answer over an id-set summary. `eval` returns null
    * for min/max over an empty set (the SQL aggregate contract);
    * counts are 0 there. */
  private sealed abstract class AggSpec(name: String, nullable: Boolean) {
    def eval(s: RangeStats): Any
    final def toField: StructField = StructField(name, LongType, nullable)
  }
  private case object RowCountSpec extends AggSpec("agg_count", false) {
    def eval(s: RangeStats): Any = java.lang.Long.valueOf(s.count)
  }
  private case object MinDocSpec extends AggSpec("agg_min_doc", true) {
    def eval(s: RangeStats): Any =
      if (s.count <= 0) null else java.lang.Long.valueOf(s.minDoc)
  }
  private case object MaxDocSpec extends AggSpec("agg_max_doc", true) {
    def eval(s: RangeStats): Any =
      if (s.count <= 0) null else java.lang.Long.valueOf(s.maxDoc)
  }
  private case object MinTsSpec extends AggSpec("agg_min_ts", true) {
    def eval(s: RangeStats): Any =
      if (s.count <= 0) null else java.lang.Long.valueOf(tsOf(s.minDoc))
  }
  private case object MaxTsSpec extends AggSpec("agg_max_ts", true) {
    def eval(s: RangeStats): Any =
      if (s.count <= 0) null else java.lang.Long.valueOf(tsOf(s.maxDoc))
  }

  /** The completely-pushed-aggregate scan: ONE partition whose row(s)
    * are closed-form arithmetic on the (already filter-pushed) doc_id
    * bounds — `count(*)` over 10^12 synthetic rows costs one
    * driver-side subtraction, not 10^12 generated rows. Global shape:
    * exactly one row (even over an empty range — the SQL global-agg
    * contract). GROUP BY lang shape: one row per NON-EMPTY residue
    * class, group column first (empty groups don't exist in SQL
    * output). */
  private final class SynAggScan(lo: Long, hi: Long, specs: Seq[AggSpec],
      grouped: Boolean) extends Scan with Batch {
    override def readSchema(): StructType =
      if (grouped)
        StructType(StructField("lang", StringType, nullable = false) +:
          specs.map(_.toField))
      else StructType(specs.map(_.toField))
    override def description(): String =
      s"SyntheticDocs[range=[$lo,$hi), pushedAggregates=" +
        s"${specs.map(_.toField.name).mkString(",")}" +
        s"${if (grouped) ", groupBy=lang" else ""}]"
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      Array(SynPartition(0L, 1L)) // one carrier partition, final rows
    override def createReaderFactory(): PartitionReaderFactory = {
      val hi0 = math.max(lo, hi)
      val rows: Array[Array[Any]] =
        if (!grouped)
          Array(specs.map(_.eval(
            RangeStats(hi0 - lo, lo, hi0 - 1))).toArray)
        else (0 until langs.length).iterator.map { r =>
          // ids in [lo, hi0) with id mod 4 == r: closed-form count
          // and first/last member of the residue class
          def upTo(x: Long) = if (x <= r) 0L else (x - r + 3) / 4
          val cnt = upTo(hi0) - upTo(lo)
          val mn = lo + (((r - lo % 4) % 4) + 4) % 4
          val mx = (hi0 - 1) - ((((hi0 - 1) % 4 - r) % 4) + 4) % 4
          (r, RangeStats(cnt, mn, mx))
        }.filter(_._2.count > 0).map { case (r, st) =>
          UTF8String.fromString(langs(r)) +: specs.map(_.eval(st)).toArray[Any]
        }.toArray
      new SynAggReaderFactory(rows)
    }
  }

  /** Ships only the pre-computed answer rows (boxed longs / UTF8
    * strings / nulls), never the scan — the factory crosses the
    * driver/executor wire. */
  private final class SynAggReaderFactory(answers: Array[Array[Any]])
      extends PartitionReaderFactory {
    override def createReader(
        partition: InputPartition): PartitionReader[InternalRow] =
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < answers.length }
        override def get(): InternalRow =
          new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(answers(i).clone())
        override def close(): Unit = ()
      }
  }

  private final class SynScan(lo: Long, hi: Long, partitions: Int,
      rowsPerTrigger: Long, required: StructType,
      desc: Boolean = false, pushedNote: String = "")
      extends Scan with Batch
      with org.apache.spark.sql.connector.read.SupportsReportOrdering {
    override def readSchema(): StructType = required

    /** Each stripe is generated in doc_id order (ascending, or
      * descending for a pushed TopN DESC), so REPORT it
      * (SupportsReportOrdering): Spark then elides its own per-
      * partition SortExec over doc_id instead of re-sorting rows that
      * are born sorted — at 100 TB a redundant sort is a full extra
      * pass over the data. Only reported when doc_id survives column
      * pruning (the ordering must be resolvable against the output). */
    override def outputOrdering(): Array[
        org.apache.spark.sql.connector.expressions.SortOrder] =
      if (!required.fieldNames.contains("doc_id")) Array.empty
      else Array(Expressions.sort(Expressions.column("doc_id"),
        if (desc) org.apache.spark.sql.connector.expressions
          .SortDirection.DESCENDING
        else org.apache.spark.sql.connector.expressions
          .SortDirection.ASCENDING))
    override def description(): String =
      s"SyntheticDocs[range=[$lo,$hi), " +
        s"cols=${required.fieldNames.mkString(",")}$pushedNote]"
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      stripes(lo, hi, partitions).map {
        case SynPartition(s, e, _) => SynPartition(s, e, desc)
      }.toArray[InputPartition]
    override def createReaderFactory(): PartitionReaderFactory =
      new SynReaderFactory(required.fieldNames)
    override def toMicroBatchStream(
        checkpointLocation: String): MicroBatchStream =
      new SynMicroBatch(hi, partitions, rowsPerTrigger,
        required.fieldNames, lo)
  }

  /** The doc_id range [start, end) cut into `partitions` disjoint
    * stripes (empty stripes dropped, not planned). */
  private def stripes(start: Long, end: Long,
      partitions: Int): Array[InputPartition] = {
    val n = end - start
    val per = (n + partitions - 1) / math.max(1, partitions)
    (0 until partitions).iterator
      .map(p => SynPartition(start + p * per,
        math.min(end, start + (p + 1) * per)))
      .filter(ip => ip.start < ip.end)
      .toArray[InputPartition]
  }

  /** The micro-batch read path: the offset IS the doc_id position —
    * nothing external to corrupt, replays are pure recomputation (the
    * same determinism the batch path has). Admission control caps a
    * trigger at `rowsPerTrigger`, so a bounded run under
    * Trigger.AvailableNow walks the corpus in several real
    * micro-batches, each planned as parallel stripes of the delta. */
  private final class SynMicroBatch(rows: Long, partitions: Int,
      rowsPerTrigger: Long, fields: Array[String], from: Long = 0L)
      extends MicroBatchStream with SupportsAdmissionControl
      with SupportsTriggerAvailableNow {
    private case class SynOffset(pos: Long) extends Offset {
      override def json(): String = pos.toString
    }
    override def initialOffset(): Offset = SynOffset(from)
    override def deserializeOffset(json: String): Offset =
      SynOffset(json.toLong)
    override def getDefaultReadLimit: ReadLimit =
      ReadLimit.maxRows(rowsPerTrigger)
    override def latestOffset(): Offset =
      throw new UnsupportedOperationException(
        "admission-controlled source: latestOffset(start, limit)")
    override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
      val s = start.asInstanceOf[SynOffset].pos
      val cap = limit match {
        case m: ReadMaxRows => m.maxRows()
        case _ => rows
      }
      SynOffset(math.min(rows, s + cap))
    }
    override def reportLatestOffset(): Offset = SynOffset(rows)
    override def prepareForTriggerAvailableNow(): Unit = ()
    override def planInputPartitions(start: Offset,
        end: Offset): Array[InputPartition] =
      stripes(start.asInstanceOf[SynOffset].pos,
        end.asInstanceOf[SynOffset].pos, partitions)
    override def createReaderFactory(): PartitionReaderFactory =
      new SynReaderFactory(fields)
    override def commit(end: Offset): Unit = ()
    override def stop(): Unit = ()
  }

  private case class SynPartition(start: Long, end: Long,
      desc: Boolean = false) extends InputPartition

  private final class SynReaderFactory(fields: Array[String])
      extends PartitionReaderFactory {
    override def createReader(
        partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[SynPartition]
      new PartitionReader[InternalRow] {
        // cursor starts one step OUTSIDE the range in iteration order
        private var id = if (p.desc) p.end else p.start - 1
        // one writer per required field — pruning decided ONCE at
        // reader build, not per row
        private val writers: Array[Long => Any] = fields.map {
          case "doc_id" => (i: Long) => i
          case "user_id" => (i: Long) => i % 9973L
          case "ts_us" => (i: Long) => tsOf(i)
          case "cents" => (i: Long) => (i * 31L) % 100000L
          case "lang" => (i: Long) => UTF8String.fromString(
            langs((i % langs.length).toInt))
          case other => throw new IllegalArgumentException(
            s"unknown synthetic column: $other")
        }
        // hot loop: ONE mutable row per reader, refilled in place —
        // downstream copies when buffering and codegen projects to
        // UnsafeRow immediately, the standard row-reuse contract for
        // v2 readers; generating N rows costs N, not N allocations.
        // a pushed-TopN-DESC partition walks the range backwards so
        // rows leave the reader already in the requested order
        private val row = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(writers.length)
        private val step = if (p.desc) -1L else 1L
        override def next(): Boolean = {
          id += step
          if (p.desc) id >= p.start else id < p.end
        }
        override def get(): InternalRow = {
          var i = 0
          while (i < writers.length) {
            row.update(i, writers(i)(id))
            i += 1
          }
          row
        }
        override def close(): Unit = ()
      }
    }
  }
}
