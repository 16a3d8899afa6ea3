package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable
import scala.util.control.NonFatal

/** Session-scoped memo cache for shared, eagerly-materialized frames
  * (the graph family's base graphs, staged streaming-run outputs) that
  * SURVIVES executor loss.
  *
  * The round-11 version of this idea (a bare TrieMap in GraphQueries)
  * had a fault-tolerance hole: the cached frames are materialized via
  * `localCheckpoint`, which stores blocks in executor memory AND
  * truncates the lineage needed to rebuild them — so one executor
  * death made every cached frame permanently unrecomputable, poisoning
  * the whole family for the session's lifetime. This cache closes the
  * hole by validating on every serve: the backing checkpoint RDD's
  * block inventory is read from the driver's BlockManagerMaster
  * metadata ([[alive]]) — every partition must still hold a live
  * block. That is a pure driver-side metadata scan, O(#cached RDDs),
  * no job, no matter how large the cached frame is (the round-12
  * version ran a full `count()` per serve — milliseconds at fixture
  * scale but O(frame) at 100 TB). If a block is gone — executor dead,
  * storage evicted, checkpoint dropped — the entry is evicted and the
  * caller's by-name thunk rebuilds it from source.
  *
  * Lifecycle (closing the round-11 leak): entries are LRU-bounded
  * ([[maxEntries]]); eviction explicitly unpersists the backing RDD so
  * checkpoint blocks are freed deterministically rather than waiting
  * on the ContextCleaner noticing the frame is unreachable. A
  * [[clear]] hook drops a whole session's entries, and the first memo
  * against a session registers a listener that clears on application
  * end — so neither the blocks nor the session outlive the app.
  *
  * Staleness contract: an entry is keyed by (session, caller key); the
  * caller's key must carry everything the frame depends on (fixture
  * dir, shuffle layout, ...). A fixture DIRECTORY WHOSE CONTENTS
  * CHANGE MID-SESSION will serve the frame built from the old
  * contents — by design (the catalog's fixture dirs are immutable);
  * call [[clear]] if a driver mutates its inputs in place.
  *
  * Thread-safety: serves are serialized on this object (builds are
  * reentrant — a thunk may memo its own dependencies). The catalog
  * runners (Verify, Bench, the spec suites) are single-threaded
  * drivers, so the coarse lock costs nothing.
  */
object FrameCache {

  /** Insertion-ordered for LRU (touch = remove + re-insert). */
  private val entries =
    mutable.LinkedHashMap.empty[(SparkSession, String), DataFrame]
  private val listened = mutable.Set.empty[SparkSession]

  /** Bound on live memoized frames across all sessions: enough for the
    * whole graph family at two layouts plus the streaming-run outputs,
    * small enough that a long-lived multi-tenant session cannot
    * accumulate unbounded checkpoint blocks across fixture dirs.
    *
    * Eviction hazard (documented contract): LRU eviction unpersists
    * the victim's checkpoint blocks even if a caller still holds the
    * served DataFrame without having run its action yet — the lineage
    * is truncated, so that action then fails LOUDLY and
    * unrebuildably. The engine's callers are safe by construction:
    * every memo site either runs its action inside the build thunk
    * (the frames are eager localCheckpoints) or composes the served
    * frame into a query executed before the next >maxEntries distinct
    * memo calls — with serial drivers and 64 slots, an entire catalog
    * family fits between serve and action. Holding a served frame
    * across unbounded later memo traffic is outside the contract.
    *
    * Sizing: the catalog has ~53 distinct memo keys per (fixture,
    * layout); at 24 slots a full alphabetical pass EVICTED the shared
    * dedup-clusters frame mid-pass (the ktable family's ~35 keys blow
    * through the LRU between q_dedup_canonical building it and
    * q_link_blocking_quality / q_sample_split_cluster_safe consuming
    * it), silently re-running the whole LSH + connected-components
    * pipeline twice more per pass (~4 s each, measured r19). 64 covers
    * the catalog's key population with headroom; the frames are
    * doc-count-sized labelings and staged-run outputs (MBs), so the
    * bound still exists only to keep a multi-tenant session from
    * accumulating blocks across many fixture dirs, not to save memory
    * within one catalog pass. */
  val maxEntries = 64

  def memo(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    synchronized {
      registerCleanup(s)
      val k = (s, key)
      entries.remove(k) match {
        case Some(df) if alive(s, df) =>
          entries.put(k, df) // LRU touch
          df
        case stale =>
          stale.foreach(unpersistBacking) // partial survivors
          val df = build
          entries.put(k, df)
          while (entries.size > maxEntries) {
            val (_, victim) = entries.head
            entries.remove(entries.head._1)
            unpersistBacking(victim)
          }
          df
      }
    }

  /** Drop (and unpersist) every entry belonging to `s`. */
  def clear(s: SparkSession): Unit = synchronized {
    val dead = entries.keys.filter(_._1 eq s).toSeq
    dead.foreach { k => entries.remove(k).foreach(unpersistBacking) }
  }

  /** Live entry count (test hook). */
  def size: Int = synchronized(entries.size)

  /** The persisted RDDs a cached frame is served from (LogicalRDD —
    * the localCheckpoint shape). */
  private def backingRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    try df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    } catch { case NonFatal(_) => Nil }

  /** Conf key: force the serve-time probe to run a real `count()`
    * even for LogicalRDD-backed frames. The default metadata probe
    * reads the driver's BlockManagerMaster inventory, which on a real
    * cluster can LAG an executor/block loss by a heartbeat — a
    * stale-positive in that window serves a lineage-truncated frame
    * whose later action fails unrebuildably. In local mode (one JVM,
    * no remote block managers) the inventory is authoritative and the
    * window does not exist, so the O(1) probe is safe; cluster
    * deployments that cannot tolerate a serve-then-fail should set
    * this to `true` and pay O(frame) per serve. */
  val strictProbeKey = "spark.graft.frameCache.strictProbe"

  /** All partitions of the cached frame still servable? The frames
    * here are lineage-truncated (localCheckpoint), so a lost block is
    * unrecoverable in place — surface that NOW, at serve time, instead
    * of deep inside a composed query's action. The probe reads the
    * driver's block-inventory metadata (getRDDStorageInfo): every
    * backing RDD must report one live block per partition. No job
    * runs, so the probe stays O(#cached RDDs) metadata however large
    * the frame — a frame with NO LogicalRDD backing (not the memo
    * sites' shape) falls back to a real count(). The metadata is
    * authoritative in local mode; on a cluster it can lag a block
    * loss by a heartbeat — [[strictProbeKey]] opts into a verifying
    * count() for that deployment. */
  private def alive(s: SparkSession, df: DataFrame): Boolean =
    backingRdds(df) match {
      case Seq() =>
        try { df.count(); true } catch { case NonFatal(_) => false }
      case rdds =>
        try {
          val info = s.sparkContext.getRDDStorageInfo
          val metaOk = rdds.forall(r => info.find(_.id == r.id)
            .exists(_.numCachedPartitions == r.getNumPartitions))
          if (!metaOk) false
          else if (s.conf.get(strictProbeKey, "false").toBoolean)
            try { df.count(); true } catch { case NonFatal(_) => false }
          else true
        } catch { case NonFatal(_) => false }
    }

  /** Free the checkpoint blocks behind a materialized frame, if its
    * plan exposes them (LogicalRDD — the localCheckpoint shape). */
  private def unpersistBacking(df: DataFrame): Unit =
    backingRdds(df).foreach { r =>
      try r.unpersist(blocking = false)
      catch { case NonFatal(_) => () }
    }

  private def registerCleanup(s: SparkSession): Unit =
    if (listened.add(s)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(
            end: SparkListenerApplicationEnd): Unit = {
          clear(s)
          FrameCache.synchronized { listened.remove(s); () }
        }
      })
    }
}
