package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: pre-shuffling a fact table into N buckets on its
  * join key at write time so every later join/aggregation on that key runs
  * WITHOUT a shuffle — the standard 100 TB lever for repeatedly-joined
  * tables (pay the shuffle once at ingest, never again).
  *
  * Bucketing requires the table catalog (bucket metadata lives there), so
  * these are `saveAsTable` writes with an explicit filesystem `path`.
  */
object Bucketing {

  /** Write `df` as a parquet table bucketed (and sorted) by `keyCol`. */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      keyCol: String, nBuckets: Int = 8): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(tableName)

  /** Partitioned + bucketed table: partition pruning on `partCol` AND
    * shuffle-free joins on `keyCol` within the surviving partitions —
    * the layout for an INCREMENTALLY GROWN index (each increment lands
    * as its own partition; readers prune to `partCol < N`, and the
    * bucket layout still satisfies the join's distribution across all
    * selected partitions).
    */
  def writeBucketedPartitioned(df: DataFrame, tableName: String, path: String,
      partCol: String, keyCol: String, nBuckets: Int = 8): Unit =
    writeBucketedPartitionedBy(df, tableName, path, Seq(partCol), keyCol, nBuckets)

  /** Multi-column partition spec variant: the IVF-PQ index partitions by
    * (batch_id, list_id) so a probe's nProbe list filter prunes whole
    * DIRECTORIES — the 100 TB "skip lists before any scoring" layout —
    * while batch_id keeps the incremental-growth/replay contract.
    */
  def writeBucketedPartitionedBy(df: DataFrame, tableName: String, path: String,
      partCols: Seq[String], keyCol: String, nBuckets: Int = 8): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .partitionBy(partCols: _*)
      .bucketBy(nBuckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(tableName)

  /** Append one increment (a new `partCol` slice) to a table created by
    * [[writeBucketedPartitioned]], re-using the table's own bucket spec
    * from the catalog so appends can never diverge from the layout.
    */
  def appendBucketedPartition(df: DataFrame, tableName: String): Unit = {
    val spark = df.sparkSession
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tableName))
    val spec = meta.bucketSpec.getOrElse(
      throw new IllegalArgumentException(s"$tableName is not bucketed"))
    df.write
      .mode(SaveMode.Append)
      .format("parquet")
      .partitionBy(meta.partitionColumnNames: _*)
      .bucketBy(spec.numBuckets, spec.bucketColumnNames.head,
        spec.bucketColumnNames.tail: _*)
      .sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
      .saveAsTable(tableName)
  }

  /** Re-register a [[writeBucketedPartitioned]] table in a FRESH session
    * catalog from its surviving data files. `saveAsTable` metadata lives
    * in the session catalog: with the default in-memory catalog it dies
    * with the JVM, while the parquet + bucket files under `path` survive
    * — so a restarted process (the crash-replay story) must re-attach
    * before `spark.table` resolves. The declared spec MUST match the
    * original write (bucket hashing is trusted from the catalog, not
    * re-verified from files); the data schema is read back from the
    * files themselves, and the partition column is declared BIGINT (the
    * convention of every incremental index here — directory inference
    * would narrow `batch_id=-1` to INT and diverge from appended data).
    * On a persistent metastore this is unnecessary and a no-op guard
    * (`tableExists`) keeps it idempotent.
    */
  def reattach(spark: SparkSession, tableName: String, path: String,
      partCol: String, keyCol: String, nBuckets: Int = 8): Unit =
    reattachBy(spark, tableName, path, Seq(partCol -> "BIGINT"), keyCol, nBuckets)

  /** Multi-column-partition [[reattach]]: `partCols` are
    * (name, declared SQL type) pairs, in the layout's partition order —
    * declared, not inferred, for the same reason as the single-column
    * form (directory inference would narrow `batch_id=-1` to INT).
    */
  def reattachBy(spark: SparkSession, tableName: String, path: String,
      partCols: Seq[(String, String)], keyCol: String, nBuckets: Int = 8): Unit = {
    if (spark.catalog.tableExists(tableName)) return
    val partNames = partCols.map(_._1).toSet
    val dataFields = spark.read.parquet(path).schema.fields
      .filterNot(f => partNames.contains(f.name))
    reattachBySchema(spark, tableName, path,
      org.apache.spark.sql.types.StructType(dataFields), partCols, keyCol, nBuckets)
  }

  /** [[reattachBy]] with the data schema DECLARED instead of inferred
    * from the files — required for tables that may legitimately be empty
    * (a fresh tombstone/monitor table, a fully-tombstoned compaction):
    * an empty directory has nothing to infer from. `schema` may include
    * the partition columns (they are split out by name).
    */
  def reattachBySchema(spark: SparkSession, tableName: String, path: String,
      schema: org.apache.spark.sql.types.StructType,
      partCols: Seq[(String, String)], keyCol: String, nBuckets: Int = 8): Unit = {
    if (spark.catalog.tableExists(tableName)) return
    val partNames = partCols.map(_._1).toSet
    val dataCols = schema.fields
      .filterNot(f => partNames.contains(f.name))
      .map(f => s"`${ident(f.name)}` ${f.dataType.sql}").mkString(", ")
    val partDecl = partCols.map { case (n, t) => s"`${ident(n)}` $t" }.mkString(", ")
    val partList = partCols.map { case (n, _) => s"`${ident(n)}`" }.mkString(", ")
    spark.sql(
      s"""CREATE TABLE `${ident(tableName)}` ($dataCols, $partDecl)
         |USING parquet
         |PARTITIONED BY ($partList)
         |CLUSTERED BY (`${ident(keyCol)}`) SORTED BY (`${ident(keyCol)}`) INTO $nBuckets BUCKETS
         |LOCATION '${sqlStr(path)}'""".stripMargin)
    // partition discovery: the catalog entry starts empty; recover the
    // existing batch_id=N directories so reads see the standing index
    spark.sql(s"ALTER TABLE `${ident(tableName)}` RECOVER PARTITIONS")
  }

  /** Escape for a single-quoted SQL string literal — a path containing a
    * quote broke (and could inject into) the interpolated CREATE TABLE
    * statements (advisor r12).
    */
  private def sqlStr(s: String): String = s.replace("'", "''")

  /** Escape for a backtick-quoted SQL identifier. */
  private def ident(s: String): String = s.replace("`", "``")

  /** Register a PLAIN (unbucketed, unpartitioned) parquet table at `path`
    * if absent — the meta-table reattach every stored index uses, with
    * the same quoting discipline as [[reattachBy]].
    */
  def attachPlain(spark: SparkSession, tableName: String, path: String): Unit =
    if (!spark.catalog.tableExists(tableName))
      spark.sql(s"CREATE TABLE `${ident(tableName)}` USING parquet " +
        s"LOCATION '${sqlStr(path)}'")

  /** Join two tables bucketed on the same key with the same bucket count:
    * plans as a sort-merge join with NO exchange on either side.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable),
        spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))
}
