package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import java.nio.file.Files

class BucketingSpec extends AnyFunSuite {

  test("joining two co-bucketed tables plans with zero shuffles") {
    val base = Files.createTempDirectory("graft_bucketed").toString
    Bucketing.writeBucketed(graft.Tables.lineitem(spark, sf0001),
      "li_bucketed", s"$base/li", "l_orderkey", nBuckets = 4)
    Bucketing.writeBucketed(graft.Tables.orders(spark, sf0001),
      "o_bucketed", s"$base/o", "o_orderkey", nBuckets = 4)
    try {
      // force the join path (not broadcast) to show the bucketing effect
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "li_bucketed", "o_bucketed",
        "l_orderkey", "o_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan)
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan)
      assert(plan.contains("SelectedBucketsCount"), plan)
      // and it computes the right thing
      val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val plain = graft.Tables.lineitem(spark, sf0001)
        .join(graft.Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaBuckets == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("compaction collapses a fragmented partitioned layout, preserving rows") {
    import graft.pipeline.Compaction
    val base = Files.createTempDirectory("graft_compact").toString
    // fragment: 16 writers into a per-date layout at tiny scale
    graft.Tables.events(spark, sf0001)
      .withColumn("event_date", to_date(col("ts")))
      .repartition(16)
      .write.partitionBy("event_date").parquet(s"$base/frag")
    val report = Compaction.compact(spark, s"$base/frag", s"$base/compact",
      "event_date", targetRecordsPerFile = 1000000L)
    assert(report.rows == 1000L)
    assert(report.filesAfter < report.filesBefore / 4,
      s"${report.filesBefore} -> ${report.filesAfter}")
    assert(spark.read.parquet(s"$base/compact").count() == 1000L)
  }
}
