package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark
import java.sql.Timestamp

class AsOfSpec extends AnyFunSuite {

  private def t(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest right row at-or-before, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, t("2024-01-01 10:00:00")),
      (2L, 10L, t("2024-01-01 12:00:00")),
      (3L, 20L, t("2024-01-01 09:00:00")), // no prior right row → NULL
      (4L, 10L, t("2024-01-01 11:00:00"))).toDF("id", "k", "ts")
    val right = Seq(
      (10L, t("2024-01-01 09:30:00")),
      (10L, t("2024-01-01 11:00:00")), // exactly equal to left id=4 → included
      (20L, t("2024-01-01 23:00:00"))).toDF("k", "ts")
    val out = AsOf.lastRightAtOrBefore(left, right, "k", "ts", "r_ts")
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[Timestamp]("r_ts"))).toMap
    assert(out(1L).contains(t("2024-01-01 09:30:00")))
    assert(out(2L).contains(t("2024-01-01 11:00:00")))
    assert(out(3L).isEmpty)
    assert(out(4L).contains(t("2024-01-01 11:00:00"))) // at-or-before includes ties
  }

  test("as-of join plans one shuffle and no join node") {
    import spark.implicits._
    val left = Seq((1L, 10L, t("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val right = Seq((10L, t("2024-01-01 09:30:00"))).toDF("k", "ts")
    val p = AsOf.lastRightAtOrBefore(left, right, "k", "ts", "r_ts")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
  }
}
