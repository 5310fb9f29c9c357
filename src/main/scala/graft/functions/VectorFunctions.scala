package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding math over array<double> columns. Vectors are cast element-wise
  * float→double first: float×float is exact in double, and the dot product
  * folds products sequentially in array order — bit-identical to DuckDB's
  * list_inner_product, which the oracle comparison relies on.
  *
  * The dot product is the native codegen'd [[VecDot]] expression (a HOF
  * `aggregate(zip_with(...))` formulation gives the same bits but runs the
  * lambda interpreter per element — ~10x slower on the pairwise-cosine hot
  * path).
  */
object VectorFunctions {

  /** Element-wise cast ArrayType(FloatType) → ArrayType(DoubleType). */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product of two array<double> columns (sequential left fold). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.toColumn(VecDot(
      org.apache.spark.sql.graft.bridge.toExpression(a),
      org.apache.spark.sql.graft.bridge.toExpression(b)))

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two array<double> columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Per-subspace nearest-centroid codes as ONE expression — see
    * [[CentroidCodes]]. `cbs` is (subspace → centroid → dims); a plain
    * k-means assignment is the single-subspace case `Seq(cs)`.
    */
  def centroidCodes(v: Column, cbs: Seq[Seq[Seq[Double]]],
      subtractHalfNorm: Boolean): Column =
    org.apache.spark.sql.graft.bridge.toColumn(CentroidCodes(
      org.apache.spark.sql.graft.bridge.toExpression(v), cbs, subtractHalfNorm))

  /** Exact int64-micros PQ quantization error — see [[CentroidErrMicros]]. */
  def centroidErrMicros(v: Column, cbs: Seq[Seq[Seq[Double]]]): Column =
    org.apache.spark.sql.graft.bridge.toColumn(CentroidErrMicros(
      org.apache.spark.sql.graft.bridge.toExpression(v), cbs))
}
