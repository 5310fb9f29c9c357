package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Bucketing

/** Lifecycle operations shared by the three stored embedding indexes
  * (LSH ANN — `Similarity.buildAnnIndex`; flat PQ — `Pq.buildPqIndex`;
  * IVF-PQ — `Pq.buildIvfPqIndex`), closing the two gaps the round-12
  * verdict ranked first:
  *
  *  - TOMBSTONES (deletion): the pipeline's own dedup/decontam decisions
  *    DROP documents (q107/q138 keep-lists, `Decontam.scrubText`), but a
  *    grow-only index kept serving their vectors forever. Every index now
  *    carries a `<prefix>_tombstones` table (vec_id, batch_id) under the
  *    same batch_id-partitioned append-if-absent discipline as the data
  *    slices; the stored query paths anti-join it BEFORE any candidate
  *    ranking, so a tombstoned vector can neither be retrieved nor
  *    displace a live candidate. Tombstones are bucketed by vec_id with
  *    the index's own bucket count, so the anti-join against the
  *    vec_id-bucketed code/vector tables is exchange-free on the corpus
  *    side (broadcast under AQE when the deletion set is small — its
  *    usual shape).
  *
  *  - COMPACTION (generation rewrite): streaming maintenance appends one
  *    batch_id partition per micro-batch, so probe cost grew with batch
  *    COUNT. [[compactTable]] rewrites a table's batch partitions into
  *    ONE generation partition (tombstoned rows physically purged,
  *    bucketing preserved, move-then-rename swap — the
  *    pipeline/Compaction discipline), after which the probe reads
  *    O(buckets) files again. The fold point is recorded in the index
  *    meta as `compacted_through`; the streaming append-if-absent probe
  *    treats every batch_id at or below it as already present, so an
  *    at-least-once replay that predates the compaction cannot
  *    re-duplicate folded rows. Compaction collapses replay history:
  *    `maxBatchId` fences below the fold point are meaningless
  *    afterwards (they now select nothing) — run compaction at the same
  *    cadence class as codebook generations, between replay windows.
  *
  * Local-FS note: the swap uses java.nio moves (rename within one
  * filesystem). A cluster deployment swaps in the Hadoop FileSystem
  * rename — same two-step discipline, different API.
  */
object IndexOps {

  /** Tombstone-table schema: who was deleted, in which maintenance batch. */
  val TombstoneSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("batch_id", LongType)))

  /** Staleness-monitor schema (PQ families): one row per maintenance
    * batch with the delta's quantization MSE vs the build-time MSE
    * recorded in meta, both in exact int64 micros.
    */
  val MonitorSchema: StructType = StructType(Seq(
    StructField("n_vecs", LongType),
    StructField("mse_micros", LongType),
    StructField("build_mse_micros", LongType),
    StructField("alert", LongType),
    StructField("batch_id", LongType)))

  /** Meta value of `compacted_through` for a never-compacted index. */
  val NeverCompacted: Long = Long.MinValue

  /** Create the (empty) tombstone table for a new index generation.
    * `overwrite = true` is the compaction reset: tombstones are consumed
    * by the rewrite, so the new generation starts clean.
    */
  def initTombstones(spark: SparkSession, tablePrefix: String, path: String,
      nBuckets: Int, overwrite: Boolean = false): Unit = {
    val table = s"${tablePrefix}_tombstones"
    if (overwrite) {
      spark.sql(s"DROP TABLE IF EXISTS `${table.replace("`", "``")}`")
      deleteRecursively(path)
    }
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], TombstoneSchema)
    Bucketing.writeBucketedPartitioned(empty, table, path,
      "batch_id", "vec_id", nBuckets)
  }

  /** Append a deletion decision (any frame with a `vec_id` column — a
    * dedup keep-list complement, a decontam drop set) under `batchId`,
    * if that batch's tombstone slice is absent — the AnnStream
    * exactly-once contract: the probe prunes to one partition, the slice
    * is a deterministic function of the decision, so at-least-once
    * replays converge with each partition landing exactly once. Batches
    * at or below the meta's `compacted_through` are skipped outright
    * (their deletions were already APPLIED by the rewrite — re-adding
    * them would tombstone any same-id vector legitimately re-ingested
    * later).
    */
  def tombstone(spark: SparkSession, tablePrefix: String, ids: DataFrame,
      batchId: Long): Unit = {
    // the DELETE stream numbers its batches independently of the index
    // maintenance stream, so tombstones carry their OWN compaction fence
    if (batchId <= tombstonesThrough(spark, tablePrefix)) return
    val table = s"${tablePrefix}_tombstones"
    val present = spark.table(table)
      .filter(col("batch_id") === batchId).limit(1).count() > 0
    if (!present)
      Bucketing.appendBucketedPartition(
        ids.select(col("vec_id")).distinct()
          .withColumn("batch_id", lit(batchId)),
        table)
  }

  /** `df` minus tombstoned vec_ids (under the `maxBatchId` replay
    * fence) — applied by every stored query path to its vec_id-bucketed
    * tables BEFORE ranking, so deletions can neither surface nor
    * displace candidates. Bucket layouts match (vec_id, same count), so
    * the anti-join needs no corpus-side exchange even when the deletion
    * set outgrows a broadcast.
    */
  def survivors(spark: SparkSession, tablePrefix: String, df: DataFrame,
      maxBatchId: Long = Long.MaxValue): DataFrame = {
    val ts = spark.table(s"${tablePrefix}_tombstones")
    // fast path: with no tombstones at all (the common state — most
    // indexes never see a deletion between compactions) the anti-join is
    // the identity, so skip it and the probe keeps its deletion-free
    // plan (2-3 fewer scans per probe; the emptiness probe itself is a
    // metadata-cheap limit-1 read of a tiny bucketed table). Correctness
    // is unaffected either way — an empty anti-join IS the identity.
    if (ts.limit(1).isEmpty) df
    else df.join(
      ts.filter(col("batch_id") < maxBatchId).select(col("vec_id")),
      Seq("vec_id"), "left_anti")
  }

  /** The meta-recorded compaction fold point — [[NeverCompacted]] until
    * the first generation rewrite (every format-2 build writes the
    * column, so the read never needs a fallback).
    */
  def compactedThrough(spark: SparkSession, tablePrefix: String): Long =
    spark.table(s"${tablePrefix}_meta")
      .select(col("compacted_through")).collect()(0).getLong(0)

  /** The tombstone-stream fold point: the highest DELETE-stream batch_id
    * whose tombstones a compaction has already physically APPLIED (the
    * delete stream and the index-maintenance stream number their batches
    * independently, so the two fences are separate meta columns).
    */
  def tombstonesThrough(spark: SparkSession, tablePrefix: String): Long =
    spark.table(s"${tablePrefix}_meta")
      .select(col("ts_compacted_through")).collect()(0).getLong(0)

  /** Highest batch_id present in `tableName` — the generation id a
    * compaction folds into.
    */
  def maxBatchId(spark: SparkSession, tableName: String): Long =
    spark.table(tableName).agg(max(col("batch_id"))).collect()(0).getLong(0)

  /** Refuse to run a generation rewrite over a HALF-LANDED maintenance
    * batch: a crash between a family's per-table appends leaves (say)
    * codes for batch N with its vecs missing — recoverable, the stream
    * replay fills exactly the missing slice — but a compaction/refit
    * that runs FIRST would fold the partial batch into the new
    * generation and advance `compacted_through` past N, after which the
    * healing replay is fenced off and the rows are lost with no
    * recovery path. The guard costs one distinct-partition-ids read per
    * table (partition-pruned metadata scans) and turns that silent loss
    * into a loud "drain the maintenance stream first".
    */
  def requireAlignedBatches(spark: SparkSession, tablePrefix: String,
      tables: Seq[String]): Unit = {
    val sets = tables.map { t =>
      t -> spark.table(s"${tablePrefix}_$t").select(col("batch_id"))
        .distinct().collect().map(_.getLong(0)).toSet
    }
    val all = sets.map(_._2).reduce(_ union _)
    val missing = sets.flatMap { case (t, s) =>
      (all diff s).toSeq.sorted.map(b => s"$t missing batch $b")
    }
    require(missing.isEmpty,
      s"$tablePrefix has a half-landed maintenance batch (" +
        missing.mkString("; ") +
        ") — replay/drain the maintenance stream before compaction or refit")
  }

  /** Rewrite one index table's batch partitions into a single generation
    * partition `gen`: surviving rows only (when `dropIds` is given),
    * batch_id re-stamped, bucket spec preserved, move-then-rename swap.
    * Other partition columns (IVF-PQ's list_id) are preserved — the
    * directory-pruning layout survives compaction.
    */
  def compactTable(spark: SparkSession, tableName: String, path: String,
      partCols: Seq[(String, String)], keyCol: String, nBuckets: Int,
      gen: Long, dropIds: Option[DataFrame]): Unit = {
    val src = spark.table(tableName)
    val surviving = dropIds.fold(src)(ids =>
      src.join(ids.select(col("vec_id")).distinct(), Seq("vec_id"), "left_anti"))
    swapIn(spark, tableName, path,
      surviving.withColumn("batch_id", lit(gen)), partCols, keyCol, nBuckets)
  }

  /** Materialize `df` as `tableName`'s NEW content (the generation-
    * rewrite core shared by compaction and codebook refits): write to a
    * sibling tmp dir FIRST — a failure leaves the live table untouched;
    * `df` may even read the table being replaced, since the write
    * materializes it fully before the swap — then a backup-rename swap
    * (live → `__old`, tmp → live, delete `__old`) and re-register. The
    * old generation is never DELETED until the new one is live: the
    * unsafe window is two directory renames, and a crash inside it
    * leaves the full previous generation at `__old` (recovery = rename
    * it back). The write repartitions ALIGNED WITH THE BUCKET HASH
    * (HashPartitioning over the bucket column with nBuckets partitions
    * is exactly the bucket-id expression), so each task holds one bucket
    * and the rewrite lands ONE file per bucket per partition directory —
    * without it the bucketed write emits a file per (source task ×
    * bucket) and a "compacted" table had MORE files than before.
    */
  def swapIn(spark: SparkSession, tableName: String, path: String,
      df: DataFrame, partCols: Seq[(String, String)], keyCol: String,
      nBuckets: Int): Unit = {
    val laidOut = df.repartition(nBuckets, col(keyCol))
    val schema = laidOut.schema
    val tmpTable = s"${tableName}__compact"
    val tmpPath = s"${path}__compact"
    val oldPath = s"${path}__old"
    spark.sql(s"DROP TABLE IF EXISTS `${tmpTable.replace("`", "``")}`")
    deleteRecursively(tmpPath)
    Bucketing.writeBucketedPartitionedBy(laidOut, tmpTable, tmpPath,
      partCols.map(_._1), keyCol, nBuckets)
    // swap: external tables — DROP removes catalog entries, never files
    spark.sql(s"DROP TABLE `${tmpTable.replace("`", "``")}`")
    spark.sql(s"DROP TABLE IF EXISTS `${tableName.replace("`", "``")}`")
    deleteRecursively(oldPath)
    val live = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(live))
      java.nio.file.Files.move(live, java.nio.file.Paths.get(oldPath))
    java.nio.file.Files.move(java.nio.file.Paths.get(tmpPath), live)
    Bucketing.reattachBySchema(spark, tableName, path, schema,
      partCols, keyCol, nBuckets)
    deleteRecursively(oldPath)
  }

  /** Highest DELETE-stream batch_id in the (about-to-be-consumed)
    * tombstone table, folded with the previous fence — an EMPTY tombstone
    * table must keep the old fence, not reset it.
    */
  def tombstoneGen(spark: SparkSession, tablePrefix: String): Long = {
    val prev = tombstonesThrough(spark, tablePrefix)
    val rows = spark.table(s"${tablePrefix}_tombstones")
      .agg(max(col("batch_id"))).collect()
    if (rows.isEmpty || rows(0).isNullAt(0)) prev
    else math.max(prev, rows(0).getLong(0))
  }

  /** Rewrite the 1-row meta table with the two post-compaction fences
    * (`compacted_through = gen` for the maintenance stream,
    * `ts_compacted_through = tsGen` for the delete stream), preserving
    * every other recorded field (codebooks, geometry, build MSE)
    * byte-for-byte — the row is collected first, so the overwrite never
    * reads the table it replaces.
    */
  def setCompactedThrough(spark: SparkSession, tablePrefix: String,
      path: String, gen: Long, tsGen: Long): Unit = {
    val metaTable = s"${tablePrefix}_meta"
    val df = spark.table(metaTable)
    val schema = df.schema
    val rows = df.collect().map { r =>
      Row.fromSeq(schema.fieldNames.toSeq.map {
        case "compacted_through" => gen
        case "ts_compacted_through" => tsGen
        case f => r.getAs[Any](f)
      })
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
      .coalesce(1).write.mode("overwrite").format("parquet")
      .option("path", s"$path/meta").saveAsTable(metaTable)
  }

  private[graft] def deleteRecursively(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }
}
