package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused tokens → hashed word-n-gram shingles: for each window of `n`
  * consecutive tokens, the h32 (optionally mod `mod`) of the tokens
  * joined by a single space — WITHOUT materializing the shingle
  * strings. The md5 digest is fed incrementally (token bytes + ' '),
  * which is byte-identical to md5(concat_ws(' ', w[i..i+n-1])) for
  * non-null tokens, so results match the builtin formulation and the
  * DuckDB oracle exactly. Output is positional (one hash per window,
  * duplicates preserved) — callers add array_distinct/array_sort as
  * needed. Docs shorter than n yield an empty array. */
final case class ShingleHashes(child: Expression, n: Int, mod: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes requires array<string> and n >= 1, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], n, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = classOf[ShingleHashes].getName
      s"${ev.value} = $cls$$.MODULE$$.compute($a, $n, ${mod}L);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val space = Array[Byte](' ')

  def compute(toks: ArrayData, n: Int, mod: Long): ArrayData = {
    val len = toks.numElements()
    val count = len - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    // token bytes cached once per row
    val bytes = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      bytes(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i).getBytes
      i += 1
    }
    val md = digest.get()
    val out = new Array[Any](count)
    i = 0
    while (i < count) {
      md.reset()
      var j = 0
      var first = true
      while (j < n) {
        // concat_ws semantics: null tokens are skipped (with their sep)
        if (bytes(i + j) != null) {
          if (!first) md.update(space)
          md.update(bytes(i + j))
          first = false
        }
        j += 1
      }
      val d = md.digest()
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      out(i) = if (mod > 0) v % mod else v
      i += 1
    }
    new GenericArrayData(out)
  }
}
