package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The CASSANDRA DATA MODEL over [[KeyedTable]]'s commit log — the
  * semantics the reference's target store gives every write
  * (verizon_table_migration_Rakesh_filters.py:347-353 appends into
  * Cassandra, where an INSERT **is** an upsert resolved per primary
  * key by write time, DELETE writes a tombstone, and compaction folds
  * SSTables): re-expressed Spark-first instead of inside a storage
  * engine.
  *
  *  - **Upsert = append + last-write-wins read.** Writes stay pure
  *    appends (the fastest thing a distributed sink can do — no
  *    read-modify-write, no locks); [[latest]] resolves the current
  *    row per key DECLARATIVELY: `max_by(payload, (_seq, _pos))` over
  *    the log, where `(_seq, _pos)` is the table's deterministic
  *    writetime (commit sequence, position in commit — metadata
  *    columns, no bytes added to rows). Loaded through
  *    [[KeyedTableCatalog]] the aggregate rides the write's bucket
  *    clustering: the latest view of a 100 TB table plans NO Exchange.
  *  - **DELETE = tombstone commit** ([[KeyedTable.KTable]]'s
  *    `SupportsDelete`): key-predicate-only, O(#keys) bytes written,
  *    nothing scanned; resolved by the same last-write-wins order, so
  *    a later re-insert of the key simply outranks the marker.
  *  - **[[rewriteCompact]] = the compaction.** Folds the live log into
  *    one snapshot commit per run: latest row per key, deleted keys
  *    dropped, tombstones older than the grace period purged
  *    (gc_grace), everything re-clustered. The snapshot commits AT THE
  *    FENCE (the max superseded sequence) and supersedes exactly what
  *    it merged — a write racing the compaction outranks the snapshot
  *    the same way it outranked the originals, and a re-run of the
  *    same fold commits the same manifest name and no-ops. Tail
  *    streams never see the snapshot (dataChange=false): in-flight
  *    tails keep consuming original commits, whose bytes
  *    [[KeyedTable.vacuum]] retains for the grace window.
  *
  * `VERSION AS OF n` time travel (the catalog's versioned loadTable)
  * composes with all of this: below a rewrite's fence the original
  * commits resolve, until retention expires them.
  */
object KeyedTableOps {

  /** The table's key column: declared properties win, else the write
    * contract proven by the committed manifests. */
  def tableKey(path: String): Option[String] = {
    val conf = KeyedTable.hadoopConf()
    KeyedTable.readProps(path, conf).get("key")
      .orElse(KeyedTable.inferWriteContract(path, conf).map(_._1))
  }

  /** Last-write-wins resolution over a KeyedTable frame: one row per
    * key — the highest (_seq, _pos) version — with tombstoned keys
    * dropped. `df` must be a scan of the table (the metadata columns
    * resolve against it); output columns are exactly the table's data
    * columns. The aggregate is partial+final hash aggregation — over a
    * catalog-loaded (bucket-clustered) scan it plans NO Exchange. */
  def latestOver(df: DataFrame, key: String): DataFrame =
    latestOver(df, Seq(key))

  /** Composite-primary-key variant — Cassandra's full key model:
    * `keys.head` is the PARTITION key (what the table clusters,
    * routes, and DELETES on); the rest are CLUSTERING columns
    * (distinct rows within a partition). Resolution happens per full
    * key tuple; a tombstone — always partition-key-level, like a
    * Cassandra partition delete — acts as a RANGE tombstone: it hides
    * every row of that partition with a lower version, while later
    * re-inserts survive. The tombstone cuts are a tiny broadcast
    * (deletes are rare events, one marker row per deleted key); the
    * big side joins and aggregates WITHOUT shuffling — grouping on a
    * superset of the partition key still satisfies the scan's
    * reported clustering. */
  def latestOver(df: DataFrame, keys: Seq[String]): DataFrame = {
    val dataCols = df.columns.toSeq
    require(keys.nonEmpty && keys.forall(dataCols.contains),
      s"key columns ${keys.mkString(",")} not among ${dataCols.mkString(",")}")
    val withMeta = df.select(dataCols.map(col) ++ Seq(
      col(KeyedTable.MetaSeq), col(KeyedTable.MetaPos),
      col(KeyedTable.MetaTombstone)): _*)
    val ver = struct(col(KeyedTable.MetaSeq), col(KeyedTable.MetaPos))
    if (keys.size == 1) {
      // single-key: the tombstone competes in the same max_by — one
      // aggregate, no second pass
      val rest = dataCols.filterNot(keys.contains)
      val payload = struct(
        col(KeyedTable.MetaTombstone).as("__tomb") +: rest.map(col): _*)
      withMeta
        .groupBy(col(keys.head))
        .agg(max_by(payload, ver).as("__w"))
        .where(!col("__w.__tomb"))
        .select(dataCols.map(c =>
          if (keys.contains(c)) col(c) else col(s"__w.`$c`").as(c)): _*)
    } else {
      val pk = keys.head
      val cuts = withMeta.where(col(KeyedTable.MetaTombstone))
        .groupBy(col(pk)).agg(max(ver).as("__cut"))
      val live = withMeta.where(!col(KeyedTable.MetaTombstone))
        .join(broadcast(cuts), Seq(pk), "left")
        .where(col("__cut").isNull || ver > col("__cut"))
      val rest = dataCols.filterNot(keys.contains)
      if (rest.isEmpty) // every column is a key: survival IS the row
        live.select(dataCols.map(col): _*).distinct()
      else live.groupBy(keys.map(col): _*)
        .agg(max_by(struct(rest.map(col): _*), ver).as("__w"))
        .select(dataCols.map(c =>
          if (keys.contains(c)) col(c) else col(s"__w.`$c`").as(c)): _*)
    }
  }

  /** The table's CURRENT STATE — what `SELECT * FROM t` means in
    * Cassandra. Reads through the clustered catalog when it is
    * registered on the session (no Exchange); falls back to a
    * path-based scan otherwise. */
  def latest(spark: SparkSession, path: String): DataFrame = {
    val key = tableKey(path).getOrElse(throw new IllegalArgumentException(
      s"KeyedTable at $path has no declared or proven key column"))
    val catalogged = spark.conf
      .getOption(s"spark.sql.catalog.${KeyedTableRegistry.CatalogName}")
      .isDefined
    val df =
      if (catalogged) spark.table(s"${KeyedTableRegistry.CatalogName}.`$path`")
      else spark.read.format("graft.sources.KeyedTable").load(path)
    latestOver(df, key)
  }

  /** Fold the live commit log into ONE snapshot commit — Cassandra's
    * compaction / Delta's OPTIMIZE, as a Spark job over the table
    * itself:
    *
    *  1. List the live manifests once. Data manifests (previous
    *     snapshots included) and tombstone manifests older than
    *     `tombstoneGraceMs` are the fold's inputs; younger tombstones
    *     stay live (a slow reader may still need them to hide
    *     versions the fold hasn't seen).
    *  2. Read the table AS OF the fence (max input sequence) — which
    *     is exactly the inputs plus any still-live tombstone at or
    *     below the fence — and resolve last-write-wins. Tombstones at
    *     or below the fence apply (idempotently, if they stay live);
    *     anything ABOVE the fence, tombstone or data, outranks the
    *     snapshot at read time, so racing commits lose nothing.
    *  3. Write the winners back through the table's own clustered V2
    *     write, committing at the fence and superseding the inputs.
    *
    * Batch reads then plan snapshot + post-fence commits; tail streams
    * skip the snapshot entirely (no data changed); vacuum reclaims the
    * superseded bytes after its grace. Returns the snapshot manifest's
    * logical name, or None when there is nothing to fold. */
  def rewriteCompact(spark: SparkSession, path: String,
      tombstoneGraceMs: Long = 24L * 3600 * 1000): Option[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val live = KeyedTable.liveManifests(path, conf)
    def isTombstoneManifest(m: KeyedTable.KManifest): Boolean =
      m.entries.nonEmpty && m.entries.forall(_.tombstone)
    val now = System.currentTimeMillis()
    val inputs = live.filter { m =>
      !isTombstoneManifest(m) ||
        (m.ts >= 0 && m.ts < now - tombstoneGraceMs)
    }
    // nothing to gain from folding fewer than two commits unless a
    // tombstone is being applied or purged
    val tombstonesInPlay = live.exists(isTombstoneManifest)
    if (inputs.isEmpty || (inputs.size < 2 && !tombstonesInPlay)) return None
    require(inputs.forall(_.seq >= 0),
      s"KeyedTable at $path has unversioned (legacy) commits — " +
        "rewriteCompact needs a total commit order")
    val fence = inputs.map(_.seq).max
    val names = inputs.map(_.name)
    val key = tableKey(path).getOrElse(throw new IllegalArgumentException(
      s"KeyedTable at $path has no declared or proven key column"))
    val contract = KeyedTable.inferWriteContract(path, conf)
    val asOf = spark.read.format("graft.sources.KeyedTable")
      .option("asOfSeq", fence.toString).load(path)
    latestOver(asOf, key).write.format("graft.sources.KeyedTable")
      .option("key", key)
      .option("writePartitions",
        contract.map(_._2).getOrElse(8).toString)
      .option("rewriteSeq", fence.toString)
      .option("rewriteSupersedes", names.mkString(","))
      .mode("append").save(path)
    Some(KeyedTable.rewriteName(names))
  }
}
