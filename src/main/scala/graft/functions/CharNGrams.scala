package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd positional character n-grams: string → array<string> of
  * every length-n window, sliced on codepoint boundaries found by one
  * forward scan — the SAME codepoint semantics as the builtin
  * `transform(sequence(1, length(s)-n+1), i -> substr(s, i, n))`
  * formulation (and DuckDB's substr on this ASCII corpus), without one
  * interpreted lambda dispatch (or a from-byte-0 boundary rescan) per
  * character position. Strings shorter than n yield an empty array. */
final case class CharNGrams(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_ngrams requires string and n >= 1, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"

  override def nullSafeEval(input: Any): Any =
    CharNGrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = classOf[CharNGrams].getName
      s"${ev.value} = $cls$$.MODULE$$.compute($s, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)
}

object CharNGrams {
  def compute(s: UTF8String, n: Int): ArrayData = {
    // one forward scan for codepoint boundaries; substringSQL would
    // rescan from byte 0 per position (O(len²) per document)
    val bytes = s.getBytes
    val numChars = s.numChars()
    val count = numChars - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](numChars + 1)
    var i = 0
    var b = 0
    while (i < numChars) {
      offs(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    offs(numChars) = b
    val out = new Array[Any](count)
    i = 0
    while (i < count) {
      out(i) = UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}
