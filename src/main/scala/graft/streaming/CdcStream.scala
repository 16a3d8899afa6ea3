package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming CDC apply — the incremental half of a migration job once
  * the bulk copy lands (reference behavior: the bulk mover's target
  * must then be kept current; cf. the reference's per-table load loop,
  * py:347-353): a keyed I/U/D changelog arrives as a stream
  * and the engine maintains the current snapshot as exactly-once
  * per-key state, emitting the post-batch row (including tombstones)
  * in update mode. The latest emission per key IS the snapshot — the
  * same last-writer-wins contract as the batch `q_migrate_cdc_apply`,
  * which StreamingSpec pins stream==batch against.
  *
  * State is one record per key (constant, seq-monotone — replayed
  * input after a restart folds in idempotently because stale seqs
  * lose), on the transformWithState surface over RocksDB like the
  * engine's other stateful operators.
  */
object CdcStream {

  /** One changelog record; `cents` is None for deletes. */
  final case class CdcRecord(k: Long, seq: Int, op: String,
      status: String, cents: Option[Long])

  def apply(log: Dataset[CdcRecord]): Dataset[CdcRecord] = {
    import log.sparkSession.implicits._
    log.sparkSession.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    log.groupByKey(_.k)
      .transformWithState(new CdcProcessor, TimeMode.None(),
        OutputMode.Update())
  }
}

/** Last-writer-wins state machine: keep the max-seq record per key,
  * emit the winner once per batch the key appears in. Ties cannot
  * happen (seq is unique per key by contract); replays are absorbed
  * because an already-applied seq never beats the stored one. */
final class CdcProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, CdcStream.CdcRecord, CdcStream.CdcRecord] {
  import CdcStream.CdcRecord

  @transient private var cur: ValueState[CdcRecord] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cur = getHandle.getValueState[CdcRecord]("cur",
      Encoders.product[CdcRecord], TTLConfig.NONE)

  override def handleInputRows(k: Long, rows: Iterator[CdcRecord],
      tv: TimerValues): Iterator[CdcRecord] = {
    val prev = if (cur.exists()) Seq(cur.get()) else Seq.empty
    val best = (prev ++ rows).maxBy(_.seq)
    cur.update(best)
    Iterator.single(best)
  }
}
