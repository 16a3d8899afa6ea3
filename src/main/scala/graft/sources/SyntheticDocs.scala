package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
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
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.SyntheticDocs")
  *     .option("rows", 100000).option("partitions", 8).load()
  * }}}
  */
class SyntheticDocs extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticDocs.SynTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
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

  private[sources] final class SynTable(rows: Long, partitions: Int)
      extends Table with SupportsRead {
    override def name(): String = s"synthetic_docs($rows)"
    override def schema(): StructType = SyntheticDocs.schema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(
        options: CaseInsensitiveStringMap): ScanBuilder =
      new SynScanBuilder(rows, partitions)
  }

  private final class SynScanBuilder(rows: Long, partitions: Int)
      extends ScanBuilder with SupportsPushDownRequiredColumns {
    private var required: StructType = SyntheticDocs.schema
    override def pruneColumns(requiredSchema: StructType): Unit =
      // empty projections (pure count) keep zero fields — honor that
      required = requiredSchema
    override def build(): Scan = new SynScan(rows, partitions, required)
  }

  private final class SynScan(rows: Long, partitions: Int,
      required: StructType) extends Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      val per = (rows + partitions - 1) / partitions
      (0 until partitions).iterator
        .map(p => SynPartition(p * per, math.min(rows, (p + 1) * per)))
        .filter(ip => ip.start < ip.end)
        .toArray[InputPartition]
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new SynReaderFactory(required.fieldNames)
  }

  private case class SynPartition(start: Long, end: Long)
      extends InputPartition

  private final class SynReaderFactory(fields: Array[String])
      extends PartitionReaderFactory {
    override def createReader(
        partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[SynPartition]
      new PartitionReader[InternalRow] {
        private var id = p.start - 1
        // one writer per required field — pruning decided ONCE at
        // reader build, not per row
        private val writers: Array[Long => Any] = fields.map {
          case "doc_id" => (i: Long) => i
          case "user_id" => (i: Long) => i % 9973L
          case "ts_us" => (i: Long) => 1704067200000000L + i * 1000000L
          case "cents" => (i: Long) => (i * 31L) % 100000L
          case "lang" => (i: Long) => UTF8String.fromString(
            langs((i % langs.length).toInt))
          case other => throw new IllegalArgumentException(
            s"unknown synthetic column: $other")
        }
        override def next(): Boolean = { id += 1; id < p.end }
        override def get(): InternalRow =
          InternalRow.fromSeq(writers.map(_(id)).toSeq)
        override def close(): Unit = ()
      }
    }
  }
}
