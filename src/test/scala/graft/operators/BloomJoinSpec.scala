package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{spark, sf0001}
import graft.Tables

/** BloomJoin.semiJoin must be BIT-EQUAL to a plain left-semi join — the
  * sketch is a performance lever only. These tests pin the equality, the
  * empty-build edge, and that the prefilter (a) really runs (might_contain
  * in the plan) and (b) really filters (passes fewer rows than the input,
  * at least as many as the exact answer — the false-positive band).
  */
class BloomJoinSpec extends AnyFunSuite {

  private def hotOrders = Tables.orders(spark, sf0001)
    .where(col("o_totalprice") > 450000.0d)
    .select(col("o_orderkey"))

  test("bloom semi join equals plain left-semi join") {
    val li = Tables.lineitem(spark, sf0001)
    val hot = hotOrders
    val viaBloom = BloomJoin
      .semiJoin(li, hot, "l_orderkey", "o_orderkey", expectedItems = 1000L)
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val exact = li
      .join(hot, li("l_orderkey") === hot("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(exact.nonEmpty, "test predicate selected no orders — weak test")
    assert(viaBloom == exact)
  }

  test("empty build side yields empty result without failing") {
    val li = Tables.lineitem(spark, sf0001)
    val none = Tables.orders(spark, sf0001)
      .where(col("o_totalprice") < 0.0d)
      .select(col("o_orderkey"))
    assert(BloomJoin.semiJoin(li, none, "l_orderkey", "o_orderkey").count() == 0L)
  }

  test("prefilter passes [exact, input) rows and appears in the plan") {
    val li = Tables.lineitem(spark, sf0001)
    val hot = hotOrders
    val sketch = BloomJoin.bloomOf(hot, "o_orderkey", expectedItems = 1000L).get
    val pre = li.where(BloomJoin.mightContain(sketch, col("l_orderkey")))
    val nPre = pre.count()
    val nAll = li.count()
    val nExact = li
      .join(hot, li("l_orderkey") === hot("o_orderkey"), "left_semi")
      .count()
    assert(nExact <= nPre, "bloom filter dropped a true match — correctness bug")
    assert(nPre < nAll, "bloom filter passed everything — no shuffle savings")
    assert(pre.queryExecution.executedPlan.toString.contains("might_contain"),
      "prefilter not planned as might_contain")
  }
}
