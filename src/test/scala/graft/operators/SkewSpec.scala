package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.spark

class SkewSpec extends AnyFunSuite {

  test("salted join returns exactly the plain join's rows on skewed data") {
    import spark.implicits._
    // 10k rows, 90% on one hot key — the shape that melts a single reducer
    val big = (1L to 10000L)
      .map(i => (if (i % 10 == 0) i % 7 else 999L, i, s"payload$i"))
      .toDF("k", "row_id", "payload")
    val small = Seq((999L, "hot"), (0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "label")
    val plain = big.join(small, "k")
      .select("row_id", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(big, small, "k", salt = 8, bigUniqueCol = "row_id")
      .select("row_id", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
    assert(plain.count(_._2 == "hot") == 9000)
  }

  test("salting spreads the hot key across all salt buckets") {
    import spark.implicits._
    val big = (1L to 5000L).map(i => (999L, i)).toDF("k", "row_id")
    val salted = big.withColumn("__salt", pmod(xxhash64(col("row_id")), lit(8)).cast("int"))
    val buckets = salted.groupBy("__salt").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(buckets.keys.toSet == (0 until 8).toSet)
    // roughly even: no bucket more than 2x the mean
    assert(buckets.values.max < 2 * (5000 / 8))
  }
}
