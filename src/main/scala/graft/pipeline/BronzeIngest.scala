package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Raw → bronze ingest, reproducing `spark_jobs/batch_etl.py` semantics as
  * composable `DataFrame => DataFrame` transforms (SURVEY §2.2 P1–P3, §2.1
  * S1/K1):
  *
  *  - P1 column-name normalization (`batch_etl.py:42-43`) — done as ONE
  *    `select` with aliases, not a rename fold: a fold builds an N-deep
  *    Project chain that Catalyst must collapse; one projection is free.
  *  - P2 partition-date derivation with the reference's fallback ladder
  *    (`batch_etl.py:46-54`): derive from the timestamp column if present,
  *    else re-cast an existing date column, else fail the contract.
  *  - P3 keep-set pruning (`batch_etl.py:57-62`).
  *  - K1 hive-partitioned parquet write after an explicit round-robin
  *    repartition (`batch_etl.py:70,76-81`).
  *
  * At 100 TB: the write partitions by low-cardinality `event_date`, so each
  * of the `targetPartitions` tasks appends to at most |dates| files; for
  * heavily skewed days switch the repartition to
  * `repartition(n, col(partitionColumn))` (the reference's commented
  * alternative, `batch_etl.py:72-73`) so dynamic partition pruning and
  * per-date file locality hold downstream.
  */
object BronzeIngest {

  /** `strip().lower().replace(" ", "_")` (`batch_etl.py:43`). */
  def normalizeName(name: String): String =
    name.trim.toLowerCase.replace(" ", "_")

  /** P1: normalize every column name in one projection. */
  def normalizeColumns(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(s"`$c`").as(normalizeName(c))).toIndexedSeq: _*)

  /** P2: derive `dateCol` from `tsCol`, with the reference's fallbacks. */
  def deriveDate(tsCol: String, dateCol: String)(df: DataFrame): DataFrame =
    if (df.columns.contains(tsCol))
      df.withColumn(dateCol, to_date(col(tsCol)))
    else if (df.columns.contains(dateCol))
      df.withColumn(dateCol, to_date(col(dateCol)))
    else
      throw new IllegalArgumentException(
        s"schema contract: need $tsCol or $dateCol, have ${df.columns.mkString(",")}")

  /** P3: keep-set intersection pruning (order-stable, deduplicated). */
  def prune(keep: Seq[String])(df: DataFrame): DataFrame = {
    val present = keep.distinct.filter(df.columns.contains)
    df.select(present.map(col).toIndexedSeq: _*)
  }

  /** Full bronze transform for an events-shaped table. */
  def transform(tsCol: String, dateCol: String, keep: Seq[String])(df: DataFrame): DataFrame =
    df.transform(normalizeColumns)
      .transform(deriveDate(tsCol, dateCol))
      .transform(prune(keep :+ dateCol))

  /** Derive the partition columns from the timestamp: `event_date`-style
    * single date column, or the reference's legacy `year`/`month` layout
    * (`tests/test_batch_etl.py:7-11`), or any mix.
    */
  def derivePartitionColumns(tsCol: String, parts: Seq[String])(df: DataFrame): DataFrame =
    parts.foldLeft(df) { (d, p) =>
      p match {
        case "year"  => d.withColumn("year", year(col(tsCol)))
        case "month" => d.withColumn("month", month(col(tsCol)))
        case "day"   => d.withColumn("day", dayofmonth(col(tsCol)))
        case dateCol => d.transform(deriveDate(tsCol, dateCol))
      }
    }

  /** K1: hive-partitioned parquet write. Round-robin repartition (the
    * reference default) maximizes write parallelism but each of the N tasks
    * appends to every open partition (N×|dates| files); repartitioning on
    * the partition columns writes one file per partition — fewer, larger
    * files and cheaper commits, at the cost of skew on hot dates (pair with
    * `maxRecordsPerFile` to re-split those).
    */
  def write(df: DataFrame, cfg: PipelineConfig): Unit = {
    df.sparkSession.conf.set("spark.sql.files.maxRecordsPerFile", cfg.maxRecordsPerFile)
    val repartitioned =
      if (cfg.repartitionByPartitionCols)
        df.repartition(cfg.targetPartitions, cfg.partitionColumns.map(col): _*)
      else df.repartition(cfg.targetPartitions)
    repartitioned
      .write.mode(SaveMode.Overwrite)
      .partitionBy(cfg.partitionColumns: _*)
      .parquet(cfg.bronzePath)
  }

  /** Whole stage: raw events → transform → partitioned bronze. Returns
    * (rowCount, outputPartitions) as stage metrics (`batch_etl.py:65-66`
    * logs the same two numbers).
    */
  def run(raw: DataFrame, cfg: PipelineConfig): Map[String, Long] = {
    val keep = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val bronze = raw.transform(normalizeColumns)
      .transform(derivePartitionColumns("ts", cfg.partitionColumns))
      .transform(prune(keep ++ cfg.partitionColumns))
    val n = bronze.count()
    write(bronze, cfg)
    Map("rows" -> n, "partitions" -> cfg.targetPartitions.toLong)
  }
}
