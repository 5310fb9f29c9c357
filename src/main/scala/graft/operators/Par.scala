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
}
