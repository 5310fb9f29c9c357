package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Micro-batch producer: slices a batch table into N CSV files dropped into
  * an inbox directory — the reference's stream simulation
  * (`scripts/simulate_stream.py:22-33`) with two fixes (SURVEY §2.5 W1):
  *
  *  1. **Deterministic slicing.** The reference slices with
  *     `limit((i+1)*rows).tail(rows)` over unspecified parquet scan order;
  *     we bucket by `ntile(n)` over an explicit ORDER BY, so batch contents
  *     are a pure function of the data.
  *  2. **No driver collect.** The reference round-trips every batch through
  *     the driver twice (`tail` + `toPandas`, `simulate_stream.py:27,30`);
  *     we write each bucket with a normal executor-side CSV sink. (The
  *     single-file-per-batch shape is preserved with `coalesce(1)` — these
  *     are simulation micro-batches, small by construction.)
  */
object InboxGenerator {

  /** Assign each row to one of `n` contiguous batches by sort order. */
  def bucket(df: DataFrame, orderCol: String, n: Int): DataFrame =
    df.withColumn("__batch",
      ntile(n).over(org.apache.spark.sql.expressions.Window.orderBy(col(orderCol))) - 1)

  /** Write `n` CSV micro-batches (batch_0.csv … batch_{n-1}.csv) into inbox.
    * Timestamps are serialized as ISO-8601 strings with explicit format so
    * the stream side re-parses them losslessly.
    */
  def generate(events: DataFrame, inbox: String, n: Int = 5): Seq[String] = {
    Files.createDirectories(Paths.get(inbox))
    val spark = events.sparkSession
    val prepared = bucket(
      events.select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        col("user_id"), col("event_type"), col("value")),
      "event_id", n)
    prepared.cache()
    try {
      (0 until n).map { i =>
        val tmp = s"$inbox/.staging_$i"
        prepared.filter(col("__batch") === i).drop("__batch")
          .coalesce(1)
          .write.mode("overwrite").option("header", "true").csv(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".csv"))
          .getOrElse(sys.error(s"no csv written for batch $i"))
        val dest = Paths.get(s"$inbox/batch_$i.csv")
        // atomic move into the watched dir so a running stream never sees a
        // half-written file (the reference's pandas to_csv has the same race)
        Files.move(part.toPath, dest, StandardCopyOption.ATOMIC_MOVE)
        deleteRecursively(new java.io.File(tmp))
        dest.toString
      }
    } finally prepared.unpersist()
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
