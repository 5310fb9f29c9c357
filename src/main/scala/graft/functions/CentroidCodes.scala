package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-subspace nearest-centroid assignment as ONE tight expression
  * (r16 optimization).
  *
  * The previous formulation built the argmax as a `greatest()` over
  * KSUB `struct(score, -c)` columns per subspace — M·KSUB VecDot +
  * struct nodes (128 for the PQ encode, 16 for a k-means assign) whose
  * literal-heavy tree made every analysis/optimize/codegen pass of an
  * encode-bearing plan pay for hundreds of nodes, and whose generated
  * code materialized KSUB struct values per row per subspace. A fit loop
  * re-plans that tree EVERY iteration (the codebook literals change), so
  * the PQ/IVF recompute queries (q121–q123, q157, q163) spent more
  * driver time planning and Janino-compiling encode trees than executing
  * them at bench scale — and at 100 TB the same tree is the generated
  * code sitting in the innermost scan loop of the index build.
  *
  * This expression embeds the codebook as a referenced constant and
  * emits the canonical three-loop argmax. Semantics are IDENTICAL to the
  * struct-greatest tree (and to the DuckDB oracle's
  * `row_number() OVER (ORDER BY s DESC, c ASC)` replay):
  *  - score s(m,c) = ⟨sub_m, ctr_{m,c}⟩ evaluated in ascending dimension
  *    order (the VecDot order), minus the driver-precomputed half-norm
  *    when `subtractHalfNorm` (the L2 rule; raw-dot rule without);
  *  - ties break to the LOWEST c: the scan keeps a candidate only on a
  *    strictly greater score.
  * Output: array<long> of the M chosen codes. q121/q163/q176/q84–q88's
  * full DuckDB oracles hash-verify the bit-parity of this rewrite.
  */
case class CentroidCodes(child: Expression,
    cbs: Seq[Seq[Seq[Double]]], subtractHalfNorm: Boolean)
    extends UnaryExpression {

  private val m = cbs.size
  private val ksub = cbs.head.size
  private val dsub = cbs.head.head.size

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"centroid_codes expects array<double>, got ${t.simpleString}")
  }

  // flat (m, c, d)-major centroid table + per-(m, c) half-norms, computed
  // once on the driver exactly as the literal tree did
  // (cbs(m)(c).map(x*x).sum / 2 — same fold order, same double).
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](m * ksub * dsub)
    var i = 0
    for (mm <- 0 until m; c <- 0 until ksub; d <- 0 until dsub) {
      a(i) = cbs(mm)(c)(d); i += 1
    }
    a
  }
  @transient private lazy val halfNorms: Array[Double] = {
    val a = new Array[Double](m * ksub)
    var i = 0
    for (mm <- 0 until m; c <- 0 until ksub) {
      a(i) = if (subtractHalfNorm) cbs(mm)(c).map(x => x * x).sum / 2 else 0.0
      i += 1
    }
    a
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * dsub)
      throw CentroidCodes.dimensionMismatch(v.numElements(), m * dsub)
    val out = new Array[Long](m)
    var mm = 0
    while (mm < m) {
      var bestS = Double.NegativeInfinity
      var bestC = 0
      var c = 0
      while (c < ksub) {
        var s = 0.0
        var d = 0
        val base = (mm * ksub + c) * dsub
        while (d < dsub) {
          s += v.getDouble(mm * dsub + d) * flat(base + d)
          d += 1
        }
        s -= halfNorms(mm * ksub + c)
        if (s > bestS) { bestS = s; bestC = c }
        c += 1
      }
      out(mm) = bestC.toLong
      mm += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val flatRef = ctx.addReferenceObj("cbFlat", flat, "double[]")
      val hnRef = ctx.addReferenceObj("cbHalfNorms", halfNorms, "double[]")
      val out = ctx.freshName("codes")
      val mm = ctx.freshName("mm")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val bestS = ctx.freshName("bestS")
      val bestC = ctx.freshName("bestC")
      val base = ctx.freshName("base")
      s"""
         |if ($v.numElements() != ${m * dsub}) {
         |  throw graft.functions.CentroidCodes.dimensionMismatch($v.numElements(), ${m * dsub});
         |}
         |long[] $out = new long[$m];
         |for (int $mm = 0; $mm < $m; $mm++) {
         |  double $bestS = Double.NEGATIVE_INFINITY;
         |  int $bestC = 0;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $s = 0.0;
         |    int $base = ($mm * $ksub + $c) * $dsub;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      $s += $v.getDouble($mm * $dsub + $d) * $flatRef[$base + $d];
         |    }
         |    $s -= $hnRef[$mm * $ksub + $c];
         |    if ($s > $bestS) { $bestS = $s; $bestC = $c; }
         |  }
         |  $out[$mm] = (long) $bestC;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CentroidCodes =
    copy(child = newChild)
}

object CentroidCodes {
  def dimensionMismatch(got: Int, want: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"centroid_codes: input vector has $got elements, codebook expects $want")
}

/** Per-row PQ quantization error in exact int64 micros — the
  * [[CentroidCodes]] twin of Pq.quantErrMicros's literal tree: for each
  * subspace, err_m = floor((⟨sub,sub⟩ − 2·bestS) · 1e6 + 0.5) with bestS
  * the winning L2-rule score (same argmax scan as the codes, so error
  * and code can never disagree on the winner), integer-summed over
  * subspaces. Bit-identical to the previous formulation: same dot order,
  * same driver-side half-norms, same IEEE op order in the floor argument
  * (q163's DuckDB oracle hash-verifies it).
  */
case class CentroidErrMicros(child: Expression, cbs: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  private val m = cbs.size
  private val ksub = cbs.head.size
  private val dsub = cbs.head.head.size

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"centroid_err_micros expects array<double>, got ${t.simpleString}")
  }

  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](m * ksub * dsub)
    var i = 0
    for (mm <- 0 until m; c <- 0 until ksub; d <- 0 until dsub) {
      a(i) = cbs(mm)(c)(d); i += 1
    }
    a
  }
  @transient private lazy val halfNorms: Array[Double] = {
    val a = new Array[Double](m * ksub)
    var i = 0
    for (mm <- 0 until m; c <- 0 until ksub) {
      a(i) = cbs(mm)(c).map(x => x * x).sum / 2; i += 1
    }
    a
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * dsub)
      throw CentroidCodes.dimensionMismatch(v.numElements(), m * dsub)
    var acc = 0L
    var mm = 0
    while (mm < m) {
      var bestS = Double.NegativeInfinity
      var ss = 0.0
      var c = 0
      while (c < ksub) {
        var s = 0.0
        var d = 0
        val base = (mm * ksub + c) * dsub
        while (d < dsub) {
          s += v.getDouble(mm * dsub + d) * flat(base + d)
          d += 1
        }
        s -= halfNorms(mm * ksub + c)
        if (s > bestS) bestS = s
        c += 1
      }
      var d = 0
      while (d < dsub) {
        val x = v.getDouble(mm * dsub + d)
        ss += x * x
        d += 1
      }
      acc += math.floor((ss - 2.0 * bestS) * 1000000.0 + 0.5).toLong
      mm += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val flatRef = ctx.addReferenceObj("cbFlat", flat, "double[]")
      val hnRef = ctx.addReferenceObj("cbHalfNorms", halfNorms, "double[]")
      val acc = ctx.freshName("acc")
      val mm = ctx.freshName("mm")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val d2 = ctx.freshName("d2")
      val s = ctx.freshName("s")
      val ss = ctx.freshName("ss")
      val bestS = ctx.freshName("bestS")
      val base = ctx.freshName("base")
      val x = ctx.freshName("x")
      s"""
         |if ($v.numElements() != ${m * dsub}) {
         |  throw graft.functions.CentroidCodes.dimensionMismatch($v.numElements(), ${m * dsub});
         |}
         |long $acc = 0L;
         |for (int $mm = 0; $mm < $m; $mm++) {
         |  double $bestS = Double.NEGATIVE_INFINITY;
         |  double $ss = 0.0;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $s = 0.0;
         |    int $base = ($mm * $ksub + $c) * $dsub;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      $s += $v.getDouble($mm * $dsub + $d) * $flatRef[$base + $d];
         |    }
         |    $s -= $hnRef[$mm * $ksub + $c];
         |    if ($s > $bestS) { $bestS = $s; }
         |  }
         |  for (int $d2 = 0; $d2 < $dsub; $d2++) {
         |    double $x = $v.getDouble($mm * $dsub + $d2);
         |    $ss += $x * $x;
         |  }
         |  $acc += (long) java.lang.Math.floor(($ss - 2.0 * $bestS) * 1000000.0 + 0.5);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CentroidErrMicros =
    copy(child = newChild)
}
