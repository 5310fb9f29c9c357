package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-prefiltered semi join: the explicit form of the runtime-filter
  * pattern Spark's own `InjectRuntimeFilter` rule applies adaptively.
  *
  * Shape: (1) aggregate the build side's join keys into ONE serialized
  * Bloom sketch (a single-row aggregate — the driver holds ~MBs of sketch,
  * never row data, the same footprint class as the DQ report row);
  * (2) filter the probe side with `might_contain` BEFORE its shuffle, so
  * only rows that can possibly match are exchanged; (3) finish with an
  * exact LEFT SEMI join, which removes the Bloom's false positives.
  *
  * The result is therefore EXACTLY the plain semi join — the sketch can
  * only affect performance, never correctness (q112's oracle is the plain
  * `IN` subquery). At 100 TB this is the difference between shuffling the
  * full fact table into the join versus only the ~selectivity fraction
  * that survives the broadcast-sized sketch; it matters most when the
  * build-side selectivity comes from something the optimizer cannot
  * estimate (an external id list, a prior pipeline stage).
  *
  * Both sides hash with `xxhash64`, the same pairing
  * `InjectRuntimeFilter` emits — `BloomFilterAggregate`'s buffer and
  * `BloomFilterMightContain` agree on the hashed-long representation.
  * These two expressions are Catalyst internals reached via the same
  * package bridge as [[graft.functions.VecDot]]; both participate in
  * whole-stage codegen, so the prefilter adds no interpreted hot path.
  */
object BloomJoin {

  /** Rows of `big` whose `bigKey` appears in `small.smallKey` — bit-equal
    * to `big LEFT SEMI JOIN small`, with a Bloom prefilter cutting the
    * probe side before its exchange.
    *
    * @param expectedItems sizing hint for the sketch (distinct build keys;
    *                      overestimating costs bits, underestimating costs
    *                      false-positive rate, never correctness)
    */
  def semiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    val keys = small.select(col(smallKey)).where(col(smallKey).isNotNull)
    val sketch = bloomOf(keys, smallKey, expectedItems)
    val rhs = keys.distinct().withColumnRenamed(smallKey, "__bloom_build_key")
    sketch match {
      case None =>
        // Empty build side: the semi join is empty; skip both the sketch
        // and the shuffle entirely.
        big.where(lit(false))
      case Some(bf) =>
        val pre = big.where(mightContain(bf, col(bigKey)))
        pre.join(rhs, pre(bigKey) === rhs("__bloom_build_key"), "left_semi")
    }
  }

  /** The serialized Bloom sketch of one key column, or None when the frame
    * is empty (BloomFilterAggregate returns SQL NULL on zero rows).
    */
  def bloomOf(keys: DataFrame, key: String, expectedItems: Long): Option[Array[Byte]] = {
    val agg = new BloomFilterAggregate(
      bridge.toExpression(xxhash64(col(key))), expectedItems).toAggregateExpression()
    Option(keys.select(bridge.toColumn(agg).as("bf")).head.getAs[Array[Byte]]("bf"))
  }

  /** `might_contain(sketch, xxhash64(key))` as a filter Column. */
  def mightContain(sketch: Array[Byte], key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    bridge.toColumn(BloomFilterMightContain(
      Literal(sketch, BinaryType),
      bridge.toExpression(xxhash64(key))))
}
