package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-code-point histogram of a string: the multiset of character
  * counts as `array<long>`, sorted by code point (deterministic output
  * order; consumers that only fold over the counts are order-independent
  * anyway).
  *
  * The built-in formulation — `split(text, '')`, `array_sort` over
  * per-char `ascii()` codes, then run-length via `filter`/`zip_with`
  * lambdas — allocates one single-character UTF8String per character plus
  * three intermediate arrays per row, and runs the lambda interpreter per
  * element. This expression walks the string's code points once into an
  * int buffer, sorts primitives, and run-length-encodes — one `long[]`
  * allocation per row, called from whole-stage codegen like [[VecDot]]
  * (tier (b) of the custom-op ladder).
  *
  * Counts are IDENTICAL to the HOF formulation for any well-formed string
  * (both enumerate code points), so DuckDB oracle twins built on
  * explode/groupBy char counts are unaffected. Empty string → empty array
  * (the HOF chain returns a single empty-string token there — callers on
  * corpora with empty documents must pick a convention; every registered
  * query's corpus has none, enforced by the oracle row counts).
  */
case class CharCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_counts expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    CharCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharCounts.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): CharCounts =
    copy(child = newChild)
}

object CharCounts {
  /** One pass over code points → sort → run-length counts. Static
    * forwarder is called from both interpreted eval and generated Java.
    */
  def counts(s: UTF8String): ArrayData = {
    val str = s.toString
    val len = str.length
    val cps = new Array[Int](len)
    var n = 0
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      cps(n) = cp
      n += 1
      i += Character.charCount(cp)
    }
    java.util.Arrays.sort(cps, 0, n)
    var k = 0
    i = 0
    while (i < n) {
      if (i == 0 || cps(i) != cps(i - 1)) k += 1
      i += 1
    }
    val out = new Array[Long](k)
    var j = -1
    i = 0
    while (i < n) {
      if (i == 0 || cps(i) != cps(i - 1)) { j += 1; out(j) = 1L }
      else out(j) += 1L
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}
