package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import java.util

/** DataSource V2 keyed-append TABLE — the SINK extension point, built
  * from scratch on the real V2 write protocol. The reference's target
  * is Cassandra through the spark-cassandra-connector
  * (verizon_table_migration_Rakesh_filters.py:347-353: append mode,
  * writes grouped by partition key, bounded write parallelism); that
  * connector IS a DSv2 `SupportsWrite` table, so this class is the
  * engine's faithful, no-egress rendering of the seam a live
  * deployment fills with one adapter:
  *
  *  - **Key-grouped writes, declaratively**: the Write implements
  *    `RequiresDistributionAndOrdering` (clustered on the key column,
  *    sorted by key within partitions, `writePartitions` tasks) — the
  *    Spark-native spelling of `batch.grouping.key=partition` +
  *    `concurrent.writes`: the engine asks the PLANNER for the
  *    distribution instead of hand-shuffling inside the sink.
  *  - **Atomic visibility via manifests**: writers stage row-log files
  *    under `data/`; a file is readable ONLY once a driver-side
  *    commit lists it in a `_commits/` manifest (written temp+rename).
  *    Task retries/speculation stage distinct files and only the
  *    committed attempt's message reaches `commit()` (Spark's output
  *    commit coordinator), so partial/duplicate attempts are garbage
  *    bytes, never visible rows.
  *  - **Exactly-once streaming**: `toStreaming` commits one manifest
  *    per epoch, named by (stable query id, epoch id); a replayed
  *    epoch (crash in the write→checkpoint window) finds its manifest
  *    already present, deletes the re-staged files, and no-ops — the
  *    V2-native version of ExactlyOnceBatchSink's marker protocol —
  *    while a DIFFERENT query's epochs never collide with this one's.
  *
  * Read-back is first-class (BATCH_READ over the manifested files,
  * one partition per file; the `file=` option narrows to one shard for
  * ops inspection). The row-log encoding is a length-framed binary of
  * the declared schema (long/int/double/string/boolean, nullable) —
  * deliberately dumb: the format under test is the COMMIT PROTOCOL,
  * not a columnar codec; production targets bring their own storage.
  *
  * Scale notes: manifests are O(#files) driver-side metadata; data
  * never flows through the driver. Atomicity relies on rename, same
  * contract as Spark's own HDFS-backed commit protocols (object-store
  * deployments swap a manifest store in, as they do for file sinks).
  */
class KeyedTable extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null, "KeyedTable requires a path")
    KeyedTable.readSchemaFile(path).getOrElse(
      throw new IllegalArgumentException(
        s"KeyedTable at $path has no committed schema yet — nothing to read"))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.get("path")
    require(path != null, "KeyedTable requires a path")
    new KeyedTable.KTable(path, schema,
      Option(opts.get("key")),
      opts.getInt("writePartitions", 8),
      Option(opts.get("chaosWriteKey")).map(_.toLong))
  }
}

object KeyedTable {

  private val supported: Set[DataType] =
    Set(LongType, IntegerType, DoubleType, StringType, BooleanType)

  // ---------- control-plane helpers (driver + executor safe) ----------

  private def fs(path: String): FileSystem =
    FileSystem.get(new java.net.URI(path),
      new org.apache.hadoop.conf.Configuration())

  private def writeAtomic(f: FileSystem, dst: Path, body: String): Unit = {
    val tmp = new Path(dst.getParent, s".${dst.getName}.tmp")
    val out = f.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (!f.rename(tmp, dst)) {
      f.delete(tmp, false)
      throw new java.io.IOException(s"commit rename failed for $dst")
    }
  }

  private def readText(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try new String(
      org.apache.commons.io.IOUtils.toByteArray(in),
      StandardCharsets.UTF_8)
    finally in.close()
  }

  private[sources] def readSchemaFile(path: String): Option[StructType] = {
    val f = fs(path)
    val p = new Path(path, "_schema.json")
    if (f.exists(p)) Some(DataType.fromJson(readText(f, p)).asInstanceOf[StructType])
    else None
  }

  /** Every data file listed by any committed manifest, in manifest
    * order (append order across commits is not meaningful — the table
    * is a keyed bag, like the modeled target). */
  private def committedFiles(path: String): Seq[String] = {
    val f = fs(path)
    val dir = new Path(path, "_commits")
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath)
      .filter(p => p.getName.endsWith(".manifest"))
      .sortBy(_.getName)
      .flatMap(p => readText(f, p).split("\n").toSeq
        .filter(_.nonEmpty))
  }

  /** Decode-compatibility: the row-log frame plan depends on field
    * ORDER and TYPES only — the null flag is always written, so
    * declared nullability (and metadata) differences are harmless and
    * must not reject a read or write. */
  private def sameShape(a: StructType, b: StructType): Boolean =
    a.fields.map(f => (f.name, f.dataType)).toSeq ==
      b.fields.map(f => (f.name, f.dataType)).toSeq

  /** First commit persists the schema; later commits must match its
    * SHAPE — a silent type/order drift would corrupt every older
    * file's decode. Publication is a fully-written unique temp file
    * renamed into place (readers NEVER see partial bytes, and a crash
    * mid-publish leaves only an invisible temp, not a bricked table);
    * the rename is skipped when a schema already exists, and everyone
    * re-reads and must match the winner. On rename-no-overwrite
    * stores (HDFS) first-publish is fully exclusive; on a clobbering
    * local FS two different-schema first writes racing inside this
    * window resolve last-complete-writer-wins and the loser fails its
    * re-check — the manifest commit re-verifies once more. */
  private def ensureSchema(path: String, schema: StructType): Unit = {
    val f = fs(path)
    val p = new Path(path, "_schema.json")
    if (readSchemaFile(path).isEmpty) {
      val tmp = new Path(path,
        s"._schema.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val out = f.create(tmp, true)
      try out.write(schema.json.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      try { if (!f.exists(p)) f.rename(tmp, p); () }
      finally { try { f.delete(tmp, false); () }
        catch { case scala.util.control.NonFatal(_) => () } }
    }
    val committed = readSchemaFile(path).getOrElse(
      throw new java.io.IOException(s"could not persist schema at $p"))
    require(sameShape(committed, schema),
      s"KeyedTable schema mismatch at $path: table has $committed, " +
        s"write brings $schema")
  }

  private def manifest(path: String, name: String,
      messages: Array[WriterCommitMessage],
      schema: StructType): Unit = {
    // last line of defense for the local-FS first-publish race: never
    // manifest rows whose shape disagrees with the winning schema
    readSchemaFile(path).foreach(c => require(sameShape(c, schema),
      s"KeyedTable schema changed under this write at $path"))
    val files = messages.collect { case m: KFileMessage if m.rows > 0 => m.file }
    ensureDirs(path)
    writeAtomic(fs(path), new Path(s"$path/_commits", name),
      files.mkString("\n"))
  }

  private def dropStaged(path: String,
      messages: Array[WriterCommitMessage]): Unit = {
    val f = fs(path)
    messages.foreach {
      case m: KFileMessage if m.rows > 0 =>
        try { f.delete(new Path(s"$path/data", m.file), false); () }
        catch { case scala.util.control.NonFatal(_) => () }
      case _ => ()
    }
  }

  private def ensureDirs(path: String): Unit = {
    val f = fs(path)
    f.mkdirs(new Path(path, "data"))
    f.mkdirs(new Path(path, "_commits"))
    ()
  }

  /** Reap staging garbage the commit protocol left invisible: data/
    * files no manifest lists (task-committed but never
    * driver-committed — a driver crash between task and job commit)
    * and orphaned `.inprogress` attempts (writer crashed before task
    * commit). Invisible bytes are CORRECT forever; vacuum is about
    * storage, so it only touches files older than `graceMs` — a
    * concurrent in-flight write's staged files are younger by
    * construction. Returns the deleted file names. */
  def vacuum(path: String, graceMs: Long = 24L * 3600 * 1000): Seq[String] = {
    val f = fs(path)
    val dataDir = new Path(path, "data")
    if (!f.exists(dataDir)) return Seq.empty
    val committed = committedFiles(path).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    f.listStatus(dataDir).toSeq
      .filter(st => st.isFile && st.getModificationTime < cutoff)
      .filter(st => !committed.contains(st.getPath.getName))
      .map { st => f.delete(st.getPath, false); st.getPath.getName }
  }

  // ---------- table ----------

  /** `chaosKey`: test-only fault injection (option `chaosWriteKey`) —
    * the row writer throws mid-file on its FIRST attempt right after
    * writing that key's row, so the retry/abort path runs against a
    * genuinely partial staged file IN THE WRITE STAGE (a failing udf
    * in the query lands below the required-distribution exchange, in
    * the map stage, and never exercises the writer at all). */
  private[sources] final class KTable(path: String, schema0: StructType,
      keyCol: Option[String], writePartitions: Int,
      chaosKey: Option[Long] = None)
      extends Table with SupportsRead with SupportsWrite {
    override def name(): String = s"keyed_table($path)"
    override def schema(): StructType = schema0
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.MICRO_BATCH_READ,
        TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)

    // read once per table handle, not per planned scan — the common
    // no-user-schema path already paid this read in inferSchema
    private lazy val committedSchema = readSchemaFile(path)

    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
      // a caller-supplied read schema whose SHAPE (field order/types)
      // differs from the committed one would mis-frame the binary
      // decode into garbage values — fail LOUDLY here instead (the
      // write side has ensureSchema); nullability differences decode
      // identically and pass
      committedSchema.foreach { committed =>
        require(sameShape(committed, schema0),
          s"KeyedTable read schema mismatch at $path: table has " +
            s"$committed, read asks for $schema0")
      }
      val only = Option(options.get("file"))
      val perTrigger = options.getInt("manifestsPerTrigger", 10)
      new ScanBuilder {
        override def build(): Scan = new KScan(path, schema0, only, perTrigger)
      }
    }

    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
      val schema = info.schema()
      schema.fields.foreach { fd =>
        require(supported.contains(fd.dataType),
          s"KeyedTable supports long/int/double/string/boolean columns; " +
            s"got ${fd.name}: ${fd.dataType.sql}")
      }
      val key = keyCol.getOrElse(schema.fieldNames.head)
      require(schema.fieldNames.contains(key),
        s"key column '$key' not in write schema ${schema.fieldNames.mkString(",")}")
      new WriteBuilder {
        override def build(): Write =
          new KWrite(path, schema, key, writePartitions, info.queryId(),
            chaosKey)
      }
    }
  }

  // ---------- write path ----------

  private final case class KFileMessage(file: String, rows: Long)
      extends WriterCommitMessage

  private final class KWrite(path: String, schema: StructType, key: String,
      writePartitions: Int, queryId: String, chaosKey: Option[Long] = None)
      extends Write with RequiresDistributionAndOrdering {
    private def factory = new KWriterFactory(path, schema,
      chaosKey.map { k =>
        val idx = schema.fieldIndex(key)
        require(schema.fields(idx).dataType == LongType,
          s"chaosWriteKey requires a LONG key column; '$key' is " +
            schema.fields(idx).dataType.sql)
        (idx, k)
      })
    // the connector contract, asked of the PLANNER: writes arrive
    // clustered by key (one task owns a key's rows) and key-sorted
    // within the task — batch.grouping.key=partition, Spark-natively
    override def requiredDistribution(): Distribution =
      Distributions.clustered(Array(Expressions.column(key)))
    override def requiredOrdering(): Array[SortOrder] =
      Array(Expressions.sort(Expressions.column(key),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
    override def requiredNumPartitions(): Int = writePartitions
    override def description(): String =
      s"KeyedTable[$path, key=$key, writePartitions=$writePartitions]"

    override def toBatch: BatchWrite = new BatchWrite {
      ensureDirs(path)
      ensureSchema(path, schema)
      override def createBatchWriterFactory(
          info: PhysicalWriteInfo): DataWriterFactory = factory
      override def commit(messages: Array[WriterCommitMessage]): Unit =
        manifest(path, s"batch-$queryId.manifest", messages, schema)
      override def abort(messages: Array[WriterCommitMessage]): Unit =
        dropStaged(path, messages)
    }

    override def toStreaming: StreamingWrite = new StreamingWrite {
      ensureDirs(path)
      ensureSchema(path, schema)
      override def createStreamingWriterFactory(
          info: PhysicalWriteInfo): StreamingDataWriterFactory = factory
      /** Exactly-once: the manifest is NAMED by (query id, epoch). A
        * replayed epoch (crash between sink commit and checkpoint
        * commit, then recovery re-runs the batch) carries the SAME
        * stable streaming-query id (recovered from the checkpoint) and
        * finds its manifest present — the re-staged files are dropped
        * and the commit no-ops. Scoping by query id keeps a SECOND
        * stream (its own checkpoint, its own id) appending to the same
        * table from colliding with this one's epoch numbers: epoch-N
        * of another query is a different manifest, never a false
        * "replay" that silently drops its rows. */
      override def commit(epochId: Long,
          messages: Array[WriterCommitMessage]): Unit = {
        val name = s"epoch-$queryId-$epochId.manifest"
        if (fs(path).exists(new Path(s"$path/_commits", name)))
          dropStaged(path, messages) // replay — already visible
        else manifest(path, name, messages, schema)
      }
      override def abort(epochId: Long,
          messages: Array[WriterCommitMessage]): Unit =
        dropStaged(path, messages)
    }
  }

  /** Serializable bridge to executors: only the path and the schema
    * (as JSON — StructType itself is serializable, json is defensive
    * clarity) cross the wire. Serves BOTH factory interfaces — the
    * streaming variant just folds the epoch into the file name. */
  private final class KWriterFactory(path: String, schema: StructType,
      chaos: Option[(Int, Long)])
      extends DataWriterFactory with StreamingDataWriterFactory {
    override def createWriter(partitionId: Int,
        taskId: Long): DataWriter[InternalRow] =
      new KRowWriter(path, schema, s"part-$partitionId-$taskId", chaos)
    override def createWriter(partitionId: Int, taskId: Long,
        epochId: Long): DataWriter[InternalRow] =
      new KRowWriter(path, schema, s"epoch-$epochId-$partitionId-$taskId",
        chaos)
  }

  /** One staged row-log file per task attempt. The attempt writes to
    * `data/.<name>.inprogress`; task commit renames it to
    * `data/<name>` and reports it upward — so a file in final
    * position was task-committed, and VISIBLE only if some driver
    * manifest lists it. Task abort deletes the inprogress file. */
  private final class KRowWriter(path: String, schema: StructType,
      base: String, chaos: Option[(Int, Long)] = None)
      extends DataWriter[InternalRow] {
    private val name =
      s"$base-${java.util.UUID.randomUUID().toString.take(8)}.rows"
    private val f = fs(path)
    private val inprogress = new Path(s"$path/data", s".$name.inprogress")
    private var out: DataOutputStream = _
    private var rows = 0L

    private val fieldWriters: Array[(DataOutputStream, InternalRow, Int) => Unit] =
      schema.fields.zipWithIndex.map { case (fd, _) =>
        fd.dataType match {
          case LongType => (o: DataOutputStream, r: InternalRow, i: Int) =>
            o.writeLong(r.getLong(i))
          case IntegerType => (o: DataOutputStream, r: InternalRow, i: Int) =>
            o.writeInt(r.getInt(i))
          case DoubleType => (o: DataOutputStream, r: InternalRow, i: Int) =>
            o.writeDouble(r.getDouble(i))
          case BooleanType => (o: DataOutputStream, r: InternalRow, i: Int) =>
            o.writeBoolean(r.getBoolean(i))
          case StringType => (o: DataOutputStream, r: InternalRow, i: Int) => {
            val b = r.getUTF8String(i).getBytes
            o.writeInt(b.length); o.write(b)
          }
          case other => throw new IllegalArgumentException(other.sql)
        }
      }

    override def write(row: InternalRow): Unit = {
      if (out == null) out = new DataOutputStream(
        new java.io.BufferedOutputStream(f.create(inprogress, true), 1 << 16))
      var i = 0
      while (i < fieldWriters.length) {
        val isNull = row.isNullAt(i)
        out.writeBoolean(isNull)
        if (!isNull) fieldWriters(i)(out, row, i)
        i += 1
      }
      rows += 1L
      // test-only fault injection: die MID-FILE on the first attempt
      // after the poisoned key's row is already in the stream — the
      // retry must leave this partial file invisible forever
      chaos.foreach { case (keyIdx, poisoned) =>
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null && tc.attemptNumber() == 0 &&
            !row.isNullAt(keyIdx) && row.getLong(keyIdx) == poisoned) {
          out.flush()
          throw new RuntimeException(
            s"graft-chaos: injected writer failure at key $poisoned")
        }
      }
    }

    override def commit(): WriterCommitMessage = {
      if (out != null) {
        out.close()
        if (!f.rename(inprogress, new Path(s"$path/data", name)))
          throw new java.io.IOException(s"task commit rename failed: $name")
      }
      KFileMessage(name, rows)
    }

    override def abort(): Unit = {
      if (out != null) out.close()
      try { f.delete(inprogress, false); () }
      catch { case scala.util.control.NonFatal(_) => () }
    }

    override def close(): Unit = ()
  }

  // ---------- read path ----------

  private final class KScan(path: String, schema: StructType,
      only: Option[String], manifestsPerTrigger: Int = 10)
      extends Scan with Batch {
    override def readSchema(): StructType = schema
    override def description(): String =
      s"KeyedTable[$path${only.map(f => s", file=$f").getOrElse("")}]"
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      val files = committedFiles(path)
      val chosen = only match {
        case Some(f) =>
          require(files.contains(f),
            s"file $f is not committed in $path (${files.size} committed)")
          Seq(f)
        case None => files
      }
      chosen.map(f => KFilePartition(path, f)).toArray[InputPartition]
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new KReaderFactory(schema)
    override def toMicroBatchStream(
        checkpointLocation: String): org.apache.spark.sql.connector
          .read.streaming.MicroBatchStream =
      new KTailStream(path, schema, manifestsPerTrigger)
  }

  /** TAIL the table as a micro-batch stream — the "keys just loaded,
    * stream them onward" half of a migration (the batch mover lands
    * commits; downstream consumes them incrementally). The OFFSET is
    * the set of consumed manifest names: manifests are immutable and
    * only ever added, so a batch's delta (end-set minus start-set) is
    * pure recomputation on replay — restart-safe with no side state.
    * Admission control paces a trigger at `manifestsPerTrigger`
    * commits (one manifest = one upstream commit — the natural unit;
    * a capped trigger picks the name-sorted prefix of the outstanding
    * set, deterministic given the offsets that bound it). Offset JSON
    * is the sorted name list — O(#commits) control-plane metadata; a
    * production deployment compacts manifests to bound it, same as
    * any file-source listing. */
  private final class KTailStream(path: String, schema: StructType,
      manifestsPerTrigger: Int)
      extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
      with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
      with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
    import org.apache.spark.sql.connector.read.streaming.{Offset => V2Offset, ReadLimit, ReadMaxFiles}

    private case class TailOffset(names: Seq[String]) extends V2Offset {
      // canonical (sorted, comma-joined): Offset equality is json
      // equality, so the same set must always serialize identically.
      // NEVER newline-join here — the checkpoint's OffsetSeqLog is
      // line-based (one line per SOURCE), so an embedded newline makes
      // one offset parse as several sources on restart
      override def json(): String = names.sorted.mkString(",")
    }
    private def parse(o: V2Offset): Set[String] =
      o.asInstanceOf[TailOffset].names.toSet

    private def listManifests(): Seq[String] = {
      val f = fs(path)
      val dir = new Path(path, "_commits")
      if (!f.exists(dir)) Seq.empty
      else f.listStatus(dir).toSeq.map(_.getPath.getName)
        .filter(_.endsWith(".manifest")).sorted
    }

    override def initialOffset(): V2Offset = TailOffset(Seq.empty)
    override def deserializeOffset(json: String): V2Offset =
      TailOffset(json.split(",").toSeq.filter(_.nonEmpty))
    override def getDefaultReadLimit: ReadLimit =
      ReadLimit.maxFiles(manifestsPerTrigger)
    override def latestOffset(): V2Offset =
      throw new UnsupportedOperationException(
        "admission-controlled source: latestOffset(start, limit)")
    override def latestOffset(start: V2Offset, limit: ReadLimit): V2Offset = {
      val seen = parse(start)
      val outstanding = listManifests().filterNot(seen)
      val take = limit match {
        case m: ReadMaxFiles => m.maxFiles()
        case _ => outstanding.size
      }
      TailOffset((seen ++ outstanding.take(take)).toSeq)
    }
    override def reportLatestOffset(): V2Offset = TailOffset(listManifests())
    override def prepareForTriggerAvailableNow(): Unit = ()
    override def planInputPartitions(start: V2Offset,
        end: V2Offset): Array[InputPartition] = {
      val delta = (parse(end) -- parse(start)).toSeq.sorted
      val f = fs(path)
      delta.flatMap { m =>
        readText(f, new Path(s"$path/_commits", m))
          .split("\n").toSeq.filter(_.nonEmpty)
      }.map(file => KFilePartition(path, file)).toArray[InputPartition]
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new KReaderFactory(schema)
    override def commit(end: V2Offset): Unit = ()
    override def stop(): Unit = ()
  }

  private case class KFilePartition(path: String, file: String)
      extends InputPartition

  private final class KReaderFactory(schema: StructType)
      extends PartitionReaderFactory {
    override def createReader(
        partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[KFilePartition]
      new PartitionReader[InternalRow] {
        private val f = fs(p.path)
        private val in = new DataInputStream(new java.io.BufferedInputStream(
          f.open(new Path(s"${p.path}/data", p.file)), 1 << 16))
        private val row = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(schema.length)
        private var eof = false

        private val fieldReaders: Array[DataInputStream => Any] =
          schema.fields.map { fd =>
            fd.dataType match {
              case LongType => (i: DataInputStream) => java.lang.Long.valueOf(i.readLong())
              case IntegerType => (i: DataInputStream) => java.lang.Integer.valueOf(i.readInt())
              case DoubleType => (i: DataInputStream) => java.lang.Double.valueOf(i.readDouble())
              case BooleanType => (i: DataInputStream) => java.lang.Boolean.valueOf(i.readBoolean())
              case StringType => (i: DataInputStream) => {
                val n = i.readInt()
                val b = new Array[Byte](n)
                i.readFully(b)
                UTF8String.fromBytes(b)
              }
              case other => throw new IllegalArgumentException(other.sql)
            }
          }

        override def next(): Boolean = {
          if (eof) return false
          // length-framed rows have no separator: EOF at a row
          // BOUNDARY is the clean end; EOF inside a row is corruption
          val first = try in.read() catch { case _: java.io.EOFException => -1 }
          if (first < 0) { eof = true; return false }
          var i = 0
          while (i < fieldReaders.length) {
            val isNull = if (i == 0) first == 1 else in.readBoolean()
            if (isNull) row.update(i, null)
            else row.update(i, fieldReaders(i)(in))
            i += 1
          }
          true
        }
        override def get(): InternalRow = row
        override def close(): Unit = in.close()
      }
    }
  }
}
