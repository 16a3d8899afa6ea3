package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.lit

/** Windows over frames that are BOUNDED BY CONSTRUCTION — per-shard
  * count aggregates, top-k results, |domain|-sized histograms (days,
  * deciles, shards). Such frames are deliberately computed in one
  * partition; partitioning by a constant makes that explicit and keeps
  * `WindowExec`'s "No Partition Defined" warning MEANINGFUL: with every
  * bounded site routed through this helper, any remaining warning in a
  * log is an unbounded global window — a scale bug, not noise.
  *
  * Do NOT use over frames whose size grows with the corpus; that is
  * exactly the case the warning exists to catch (route those through
  * [[ShardedRank]] or a two-phase sharded cumsum instead). */
object BoundedWindow {

  // a bare lit(0) partition key is constant-FOLDED out of the window
  // spec (leaving it empty again); the Materialize fence is
  // non-foldable, so the single-partition intent survives optimization
  private def one: Column =
    graft.functions.GraftFunctions.materialize(lit(0))

  /** `OVER (ORDER BY …)` over a bounded frame. */
  def ordered(cols: Column*): WindowSpec =
    Window.partitionBy(one).orderBy(cols: _*)

  /** `OVER ()` (whole-frame aggregate) over a bounded frame. */
  def all(): WindowSpec = Window.partitionBy(one)
}
