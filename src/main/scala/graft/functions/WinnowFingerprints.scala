package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native winnowing fingerprints (Schleimer/Wilkerson/Aiken) over a token
  * array: the DISTINCT minima of each `v`-hash winnow window over the
  * rolling hashes of each `w`-token text window, sorted ascending.
  *
  * The built-in formulation assembles every w-token window as a string
  * (`concat_ws(slice(t, i, w))`) before hashing — O(len·w) bytes copied
  * per document, the dominant cost of the winnow query at any scale. This
  * expression hashes each token once (FNV-1a), combines windows with a
  * polynomial ROLLING hash (O(1) per step after the first window), and
  * takes window minima with a monotonic deque (O(1) amortized) — O(len)
  * total, like [[VecDot]]/[[CharCounts]] a tier-(b) scalar expression
  * that stays inside whole-stage codegen.
  *
  * Fingerprint VALUES differ from any string-hash formulation (different
  * hash function), but every winnowing guarantee is hash-agnostic: equal
  * w-token windows get equal hashes, so any shared run of >= w + v - 1
  * tokens still selects one common fingerprint on both sides, and a
  * shared fingerprint still implies (w.h.p.) a shared w-token window —
  * the subset/guarantee/reduction properties AssemblySpec pins.
  *
  * Short inputs follow the HOF chain's convention: fewer than w tokens →
  * ONE window covering all tokens; fewer than v window-hashes → one
  * winnow window covering all of them. Empty token array → one hash of
  * zero tokens (the seed), matching `slice` on an empty array.
  */
case class WinnowFingerprints(child: Expression, w: Int, v: Int)
    extends UnaryExpression {

  require(w >= 1 && v >= 1, s"winnow_fingerprints needs w,v >= 1 (got $w,$v)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.fingerprints(input.asInstanceOf[ArrayData], w, v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowFingerprints.fingerprints($c, $w, $v)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  private final val B = 1000003L           // polynomial base (odd, > any hash byte)
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** FNV-1a 64 over the token's UTF-8 bytes. */
  private def tokenHash(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** Static forwarder called from interpreted eval and generated Java. */
  def fingerprints(tokens: ArrayData, w: Int, v: Int): ArrayData = {
    val n = tokens.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      // a null element (legal in ArrayType(StringType, containsNull=true)
      // inputs not produced by split()) hashes like the empty token
      // instead of NPE-ing inside a codegen'd task
      val t = tokens.getUTF8String(i)
      th(i) = if (t == null) FnvOffset else tokenHash(t.getBytes)
      i += 1
    }
    // rolling window hashes: nW = max(n - w + 1, 1); a short input gets one
    // window over all tokens
    val nW = math.max(n - w + 1, 1)
    val wh = new Array[Long](nW)
    val wEff = math.min(w, n)
    var h = 0L
    i = 0
    while (i < wEff) { h = h * B + th(i); i += 1 }
    wh(0) = h
    if (nW > 1) {
      // bPow = B^(w-1) under wrapping arithmetic
      var bPow = 1L
      i = 0
      while (i < w - 1) { bPow *= B; i += 1 }
      var p = 1
      while (p < nW) {
        h = (h - th(p - 1) * bPow) * B + th(p + w - 1)
        wh(p) = h
        p += 1
      }
    }
    // sliding minima over v consecutive window hashes via monotonic deque
    val nV = math.max(nW - v + 1, 1)
    val minima = new Array[Long](nV)
    if (nW <= v) {
      var m = wh(0); i = 1
      while (i < nW) { if (wh(i) < m) m = wh(i); i += 1 }
      minima(0) = m
    } else {
      val deque = new Array[Int](nW) // indices, increasing hash values
      var head = 0
      var tail = 0 // exclusive
      i = 0
      while (i < nW) {
        while (tail > head && wh(deque(tail - 1)) >= wh(i)) tail -= 1
        deque(tail) = i; tail += 1
        if (deque(head) <= i - v) head += 1
        if (i >= v - 1) minima(i - v + 1) = wh(deque(head))
        i += 1
      }
    }
    // distinct + sorted (deterministic output; consumers explode directly)
    java.util.Arrays.sort(minima)
    var k = 0
    i = 0
    while (i < nV) {
      if (i == 0 || minima(i) != minima(i - 1)) { minima(k) = minima(i); k += 1 }
      i += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(minima, k))
  }
}
