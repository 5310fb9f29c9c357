package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guard for per-row-heavy operators (minhash signatures,
  * simhash folds, pairwise cosine): small parquet inputs arrive as a single
  * scan partition (one file < maxPartitionBytes), which serializes the whole
  * stage on one core no matter how many executors exist. Fan the rows out
  * to the cluster's parallelism before burning CPU on them.
  *
  * At real scale inputs already carry enough partitions (sized by
  * `spark.sql.files.maxPartitionBytes`), so this is a no-op there — the
  * check keeps us from *shrinking* a large input.
  */
object Par {
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** Shard count for the two-stage batched top-k cuts: explicit when
    * `nShards` > 0, otherwise shuffle.partitions / batchSize rounded up —
    * stage-1 reducer fan-out (batch · shards) then tracks the cluster's
    * reducer budget (32 at local[32], thousands on a real cluster)
    * instead of a constant that over-pays a redundant second sort at
    * small scale and under-parallelizes at large. Results are identical
    * for ANY shard count (spec-pinned), so conf-dependence is safe.
    */
  def resolveShards(spark: org.apache.spark.sql.SparkSession,
      nShards: Int, batchSize: Int): Int =
    if (nShards > 0) nShards
    else math.max(1,
      (spark.sessionState.conf.numShufflePartitions + batchSize - 1) / batchSize)
}
