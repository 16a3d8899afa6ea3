package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Row-local PPJoin rarity ranking: reorder a doc's (sorted, distinct,
  * < 2³¹) hashed-shingle array ascending by (df, shingle), where df
  * comes from a BINARY SEARCH into a broadcast (keys, dfs) dictionary
  * sorted by key; absent keys rank with df = 1 (a df = 1 shingle can
  * never generate a candidate — no second doc shares it — so the df ≥ 2
  * dictionary loses nothing; see DedupQueries.prefixIndex).
  *
  * This replaces the explode → broadcast-hash-join → collect_list →
  * array_sort(struct) rank pipeline with one codegen'd projection over
  * the shingle column itself: no exchange, no per-doc struct buffers,
  * O(|sh| log |dict|) lookups + one O(|sh| log |sh|) primitive sort per
  * row. SCALING.md records the single-row-MAP variant of this idea
  * failing 20× because Spark's map lookup is a linear scan — sorted
  * arrays + binary search are the fix for exactly that defect.
  *
  * Ordering is packed into one long per element: (df << 31) | shingle.
  * Shingle hashes are mod P = 2³¹−1 so they fit 31 bits exactly; df
  * saturates at 2³²−1 (keys beyond 4.29 G occurrences keep a CONSISTENT
  * total order — saturated keys tie-break by shingle — which is all the
  * prefix-filter correctness needs; rarity order is a pruning heuristic,
  * never a correctness condition). */
final case class RankByDf(first: Expression, second: Expression,
                          third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(first, second, third).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rank_by_df requires three array<bigint> inputs, got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rank_by_df"

  override def nullSafeEval(sh: Any, keys: Any, dfs: Any): Any =
    RankByDf.compute(sh.asInstanceOf[ArrayData],
      keys.asInstanceOf[ArrayData], dfs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sh, keys, dfs) => {
      val cls = classOf[RankByDf].getName
      s"${ev.value} = $cls$$.MODULE$$.compute($sh, $keys, $dfs);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): RankByDf =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object RankByDf {
  private final val MaxDf = 0xFFFFFFFFL

  def compute(sh: ArrayData, keys: ArrayData, dfs: ArrayData): ArrayData = {
    val n = sh.numElements()
    val nk = keys.numElements()
    val packed = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = sh.getLong(i)
      // binary search the sorted dictionary keys
      var lo = 0
      var hi = nk - 1
      var df = 1L
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val k = keys.getLong(mid)
        if (k == s) { df = dfs.getLong(mid); lo = hi + 1 }
        else if (k < s) lo = mid + 1
        else hi = mid - 1
      }
      val cdf = if (df > MaxDf) MaxDf else df
      packed(i) = (cdf << 31) | s
      i += 1
    }
    java.util.Arrays.sort(packed)
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) = packed(i) & 0x7FFFFFFFL
      i += 1
    }
    new GenericArrayData(out)
  }
}
