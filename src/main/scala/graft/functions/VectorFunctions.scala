package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding math as pure built-in column expressions (no UDFs — stays in
  * whole-stage codegen). Vectors are cast element-wise float→double first:
  * float×float is exact in double, and both Spark's `aggregate` and DuckDB's
  * `list_inner_product` then fold the identical products in array order, so
  * the oracle comparison is deterministic to the ulp.
  */
object VectorFunctions {

  /** Element-wise cast ArrayType(FloatType) → ArrayType(DoubleType). */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product of two array<double> columns (sequential left fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two array<double> columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))
}
