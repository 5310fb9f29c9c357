package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gold layer of the medallion architecture the reference names but ships
  * no code for (`/root/reference/README.md:81` "Bronze, Silver, Gold data
  * architecture"): consumption-ready daily aggregates built from silver.
  *
  * One grouped pass over silver → (event_date, event_type) grain with the
  * counts/sums a dashboard or downstream join actually reads. Partitioned
  * by event_date on write, so daily scheduled runs (dags/graft_etl_daily.py)
  * overwrite only the affected date partitions and consumers prune to the
  * dates they query. At 100 TB the input is one shuffle on the (date, type)
  * key — the output is thousands of rows, never a scale concern.
  */
object GoldAggregate {

  /** The gold daily-summary frame (also exposed as query q71 for the
    * oracle harness — column set and names are shared).
    */
  def dailySummary(silver: DataFrame): DataFrame =
    silver
      .groupBy(col("event_date"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 2).as("total_value"),
        round(avg(col("value")), 4).as("avg_value"))

  /** Write gold from the silver path; returns stage metrics for the Runner. */
  def run(spark: SparkSession, cfg: PipelineConfig): Map[String, Long] = {
    val silver = spark.read.parquet(cfg.silverPath)
    val gold = dailySummary(silver)
    gold.write
      .mode(cfg.silverMode)
      .partitionBy("event_date")
      .parquet(cfg.goldPath)
    Map("gold_rows" -> spark.read.parquet(cfg.goldPath).count())
  }
}
