package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: pairs (l, r) sharing equi-keys with
  * `r.value ∈ [l.value + lo, l.value + hi]`, built as an EQUI-join so it
  * shuffles instead of planning a BroadcastNestedLoopJoin/cartesian (what
  * Spark gives a raw inequality join; Databricks ships a range-join hint for
  * exactly this reason — OSS Spark has no operator for it).
  *
  * Mechanics: both sides are bucketed by `value DIV w` with bucket width
  * w = hi - lo. A left row's admissible interval [v+lo, v+hi] has length
  * exactly w, so it overlaps precisely two consecutive buckets — the left
  * side explodes to those two (constant 2× fan-out, no data-dependent blow
  * up), the join runs on (keys..., bucket), and an exact band filter drops
  * the false candidates inside the bucket. A right row carries ONE bucket,
  * so a true pair is produced exactly once — no dedup pass needed.
  *
  * Scale: the shuffle key (keys, bucket) is as selective as the band is
  * narrow — at 100 TB the per-task work is (rows in one bucket)², bounded
  * by key×bucket co-occurrence, not |left|×|right|. Skewed hot buckets are
  * AQE skew-join territory like any other equi-join. Bucket arithmetic is
  * pure int64 (floor division via pmod, exact for negative values too) —
  * no doubles, so bucket assignment can never disagree with the band
  * filter at the boundaries.
  */
object RangeJoin {

  /** @param keys     equi-key columns present on both sides
    * @param leftVal  int64 band anchor column on `left` (e.g. epoch micros)
    * @param rightVal int64 band value column on `right`; column names other
    *                 than `keys` must be disjoint between the sides
    * @param lo,hi    inclusive band `[leftVal+lo, rightVal<=leftVal+hi]`, lo < hi
    */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftVal: String,
      rightVal: String,
      lo: Long,
      hi: Long): DataFrame = {
    require(hi > lo, s"empty band [$lo,$hi]")
    val w = hi - lo
    // floor division that is exact and sign-correct on int64: DIV truncates
    // toward zero, so route through pmod (always >= 0) first.
    def bucketOf(v: String, shift: Long) =
      expr(s"(($v + $shift) - pmod($v + $shift, ${w}L)) DIV ${w}L")
    val l2 = left.withColumn(
      "__band",
      explode(sequence(bucketOf(leftVal, lo), bucketOf(leftVal, hi))))
    val r2 = right.withColumn("__band", bucketOf(rightVal, 0L))
    l2.join(r2, keys :+ "__band")
      .filter(
        col(rightVal) >= col(leftVal) + lit(lo) &&
          col(rightVal) <= col(leftVal) + lit(hi))
      .drop("__band")
  }
}
