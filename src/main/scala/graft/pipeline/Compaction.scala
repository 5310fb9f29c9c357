package graft.pipeline

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction for partitioned parquet layouts. Streaming sinks
  * and fine-grained partition writes accumulate many small files per
  * partition; at scale that degrades listing, scan planning, and read
  * throughput. Compaction rewrites each hive partition into
  * ~`targetRecordsPerFile`-row files (generalizing the reference's
  * `maxRecordsPerFile` knob, `batch_etl.py:13`).
  *
  * The rewrite lands in `outPath`; callers swap directories atomically
  * (same move-then-rename discipline as HttpFetch) so readers never see a
  * half-compacted table.
  */
object Compaction {

  final case class CompactionReport(
      rows: Long, filesBefore: Long, filesAfter: Long)

  def compact(spark: SparkSession, inPath: String, outPath: String,
      partitionCol: String, targetRecordsPerFile: Long = 1000000L): CompactionReport = {
    def parquetFiles(p: String): Long = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(p)).count(_.getName.endsWith(".parquet")).toLong
    }
    val df = spark.read.parquet(inPath)
    val rows = df.count()
    spark.conf.set("spark.sql.files.maxRecordsPerFile", targetRecordsPerFile)
    // one task per output partition bundle: repartition on the partition
    // column so each hive partition's rows land in as few files as the
    // record cap allows
    df.repartition(col(partitionCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(outPath)
    CompactionReport(rows, parquetFiles(inPath), parquetFiles(outPath))
  }
}
