package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.spark

/** RangeJoin correctness: the bucketed equi-join must return EXACTLY the
  * pairs a naive inequality join returns (including band-boundary values —
  * the bucket arithmetic is all-int64 precisely so boundaries can't drift),
  * once each, and must not plan a BNLJ/cartesian.
  */
class RangeJoinSpec extends AnyFunSuite {
  import spark.implicits._

  // values chosen to sit ON bucket edges and band edges: with band
  // [-10, 10] the bucket width is 20, and 20/40/...\ are bucket boundaries
  private val left = Seq((1L, 0L), (1L, 20L), (2L, 19L), (3L, -25L))
    .toDF("k", "lv")
  private val right = Seq(
    (1L, -10L), (1L, 10L), (1L, 11L), (1L, 30L), (1L, 31L),
    (2L, 9L), (2L, 29L), (2L, 30L), (3L, -35L), (3L, -15L), (4L, 0L))
    .toDF("k", "rv")

  private def naive = left.join(right, Seq("k"))
    .filter(col("rv") >= col("lv") - 10 && col("rv") <= col("lv") + 10)

  test("band join equals the naive inequality join, each pair exactly once") {
    val banded = RangeJoin.bandJoin(left, right, Seq("k"), "lv", "rv", -10L, 10L)
      .select("k", "lv", "rv").collect().map(_.toString).toSeq
    val expected = naive.select("k", "lv", "rv").collect().map(_.toString).toSeq
    assert(banded.sorted == expected.sorted)
    assert(banded.size == banded.distinct.size, "a pair was emitted twice")
    assert(banded.nonEmpty)
    // boundary pins: rv = lv ± 10 are IN, rv = lv ± 11 are OUT
    assert(banded.contains("[1,0,-10]") && banded.contains("[1,0,10]"))
    assert(!banded.exists(_ == "[1,0,11]"))
  }

  test("negative values bucket correctly (floor, not truncate-toward-zero)") {
    val banded = RangeJoin.bandJoin(left, right, Seq("k"), "lv", "rv", -10L, 10L)
      .filter(col("k") === 3).select("rv").as[Long].collect().toSet
    assert(banded == Set(-35L, -15L)) // both within [-35, -15] around -25
  }

  test("plans an equi-join (shuffle/broadcast hash), never BNLJ or cartesian") {
    val plan = RangeJoin.bandJoin(left, right, Seq("k"), "lv", "rv", -10L, 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
