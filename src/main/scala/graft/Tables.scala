package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Loaders for the driver testdata (`/root/testdata/sf*`; see TESTDATA.md).
  *
  * All tables are plain parquet. The one wrinkle: `events.ts` is written as
  * parquet TIMESTAMP(NANOS,false), which Spark's vectorized reader rejects
  * ([PARQUET_TYPE_ILLEGAL]). We read it via the documented escape hatch
  * `spark.sql.legacy.parquet.nanosAsLong` and convert ns→µs ourselves, as a
  * TIMESTAMP_NTZ so it round-trips bit-identically with DuckDB's
  * `CAST(ts AS TIMESTAMP)` (naive µs truncation) on the oracle side.
  */
object Tables {
  val starTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Register every testdata table as a temp view so the full engine
    * surface is reachable through plain `spark.sql(...)` — the DataFrame
    * queries and SQL resolve to identical Catalyst plans.
    */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    (starTables ++ Seq("documents", "embeddings"))
      .foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    events(spark, dir).createOrReplaceTempView("events")
  }

  /** A string key identifying a session WITHOUT holding the session
    * object (advisor r12): long-lived memo maps keyed on the
    * `SparkSession` itself pinned stopped sessions (and every frame
    * their values referenced) for the JVM lifetime. The classic
    * session's UUID is the stable identity; the identityHashCode
    * fallback only exists for exotic non-classic implementations.
    */
  def sessionKey(s: SparkSession): String =
    // sessionUUID is public at the bytecode level but private[sql] to
    // Scala — reflection is the sanctioned-visibility-free read; the
    // identity-hash fallback only exists for exotic implementations
    try s.getClass.getMethod("sessionUUID").invoke(s).asInstanceOf[String]
    catch { case _: ReflectiveOperationException =>
      String.valueOf(System.identityHashCode(s))
    }

  /** events with `ts` as TIMESTAMP_NTZ (µs, UTC wall clock).
    *
    * Handles BOTH testdata layouts the driver has shipped: the original
    * TIMESTAMP(NANOS) files (arrive as BIGINT ns under the escape hatch,
    * converted ns→µs here) and the current TIMESTAMP(MICROS) files (arrive
    * as a native timestamp already). Either way the result is the same
    * µs-precision TIMESTAMP_NTZ, bit-identical with DuckDB's
    * `CAST(ts AS TIMESTAMP)` on the oracle side.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(spark, dir, "events")
    val converted = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
    converted.withColumn("ts", col("ts").cast(TimestampNTZType))
  }
}
