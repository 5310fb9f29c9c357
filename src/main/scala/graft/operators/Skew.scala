package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins. AQE's skew-join split (on by default)
  * handles most cases at runtime; explicit salting remains the tool when a
  * single join key dominates so heavily that even split partitions bottleneck
  * — the classic 100 TB hot-key scenario (one user, one null-bucket, one
  * hot date).
  */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a deterministic salt in
    * [0, salt) derived from a unique column — same key now spreads over
    * `salt` shuffle partitions — and the small side is replicated once per
    * salt value. Result set is exactly the plain join's.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int, bigUniqueCol: String): DataFrame = {
    require(salt > 0, "salt must be positive")
    val bigS = big.withColumn("__salt", pmod(xxhash64(col(bigUniqueCol)), lit(salt)).cast("int"))
    val smallS = small.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
