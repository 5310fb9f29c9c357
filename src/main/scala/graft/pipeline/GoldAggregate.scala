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
    *
    * Value aggregates go through an EXACT decimal(18,6) sum, then a single
    * double conversion: a plain double sum is partition-order-dependent and
    * can flip a rounded digit between cluster sizes (caught by the
    * determinism sweep at 3 vs 8 cores), which a published gold table must
    * never do.
    */
  def dailySummary(silver: DataFrame): DataFrame = {
    val exactSum = sum(col("value").cast("decimal(18,6)")).cast("double")
    silver
      .groupBy(col("event_date"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(exactSum, 2).as("total_value"),
        round(exactSum / count(lit(1)), 4).as("avg_value"))
  }

  /** Write gold from the silver path; returns stage metrics for the Runner. */
  def run(spark: SparkSession, cfg: PipelineConfig): Map[String, Long] = {
    val silver = spark.read.parquet(cfg.silverPath)
    val gold = dailySummary(silver)
    gold.write
      .mode(cfg.silverMode)
      // dynamic: an overwrite run replaces only the event_date partitions
      // present in this run's silver — without it, overwrite+partitionBy
      // truncates the whole gold table, losing every date an incremental
      // run didn't re-process
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_date")
      .parquet(cfg.goldPath)
    // metric = THIS run's rows (a read-back count would report the whole
    // historical table under append mode); the aggregate is tiny
    Map("gold_rows" -> gold.count())
  }
}
