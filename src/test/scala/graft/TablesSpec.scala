package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{spark, sf0001}
import java.nio.file.Files

class TablesSpec extends AnyFunSuite {

  test("registerViews exposes the whole surface through spark.sql") {
    Tables.registerViews(spark, sf0001)
    val viaSql = spark.sql(
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    import org.apache.spark.sql.functions._
    val viaDf = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag")).agg(round(sum(col("l_quantity")), 2).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaSql == viaDf)
    // events view carries the ns-timestamp conversion
    assert(spark.sql("SELECT count(*) FROM events WHERE ts IS NOT NULL")
      .collect()(0).getLong(0) == 1000L)
  }

  test("JSON source/sink round-trips events losslessly") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_json").toString
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    ev.write.json(s"$dir/events_json")
    val back = spark.read.json(s"$dir/events_json")
    assert(back.count() == 1000L)
    val a = ev.orderBy("event_id").collect().map(_.toString).toSeq
    val b = back.select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id").collect().map(_.toString).toSeq
    assert(a == b)
  }
}
