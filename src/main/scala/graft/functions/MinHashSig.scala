package graft.functions

import graft.ops.TextOps
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd k=16 minhash signature: one pass over the hash array
  * maintaining all 16 minima, vs 16 interpreted
  * `array_min(transform(...))` passes. Bit-compatible with
  * [[TextOps.minhashSigFromHashes]] — same (a*h+b) mod P arithmetic,
  * same constants — so the DuckDB oracle twin is unchanged. Null
  * elements are skipped (matching array_min over a transform that maps
  * null→null); an empty array yields an all-null signature. */
final case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val k = MinHashSig.K
    val mins = Array.fill(k)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        seen = true
        val h = a.getLong(i)
        var p = 0
        while (p < k) {
          val v = (MinHashSig.A(p) * h + MinHashSig.B(p)) % MinHashSig.P
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    if (!seen) new GenericArrayData(Array.fill[Any](k)(null))
    else new GenericArrayData(mins.map(v => v: Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val p = ctx.freshName("p")
      val n = ctx.freshName("n"); val h = ctx.freshName("h")
      val v = ctx.freshName("v"); val mins = ctx.freshName("mins")
      val seen = ctx.freshName("seen"); val out = ctx.freshName("out")
      val ac = ctx.freshName("aConst"); val bc = ctx.freshName("bConst")
      val cls = classOf[MinHashSig].getName // companion statics via MODULE$
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[${MinHashSig.K}];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $seen = false;
         |long[] $ac = $cls$$.MODULE$$.A();
         |long[] $bc = $cls$$.MODULE$$.B();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $seen = true;
         |    long $h = $a.getLong($i);
         |    for (int $p = 0; $p < ${MinHashSig.K}; $p++) {
         |      long $v = ($ac[$p] * $h + $bc[$p]) % ${MinHashSig.P}L;
         |      if ($v < $mins[$p]) $mins[$p] = $v;
         |    }
         |  }
         |}
         |Object[] $out = new Object[${MinHashSig.K}];
         |if ($seen) { for (int $p = 0; $p < ${MinHashSig.K}; $p++) $out[$p] = (Long) $mins[$p]; }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val P: Long = TextOps.P
  val K: Int = TextOps.numHashes
  val A: Array[Long] = TextOps.minhashA.toArray
  val B: Array[Long] = TextOps.minhashB.toArray
}
