package graft.queries

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.operators.{Pq, Similarity}

/** Build-once/query-many plumbing for the stored-index queries (q158 /
  * q159): the first invocation per (session, sfDir) builds the standing
  * index into a temp directory and registers its bucketed tables; every
  * later invocation — Bench's timed reps after the untimed warmup, which
  * is exactly the build-once/query-many cost a training pipeline sees —
  * pays only the probe. The memo key includes the session because table
  * registrations die with it (in-memory catalog); a fresh JVM rebuilds
  * from the source parquet, which is also what keeps the soak's
  * CPUS=3-vs-8 determinism sweep honest (two JVMs, two independent
  * builds, bit-identical query output required).
  */
private[queries] object StoredIndexes {

  private val built = new ConcurrentHashMap[(SparkSession, String, String), String]()

  private def tag(dir: String): String = dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Standing LSH ANN index over `embeddings` at `dir`; returns its
    * table prefix.
    */
  def ann(s: SparkSession, dir: String): String =
    built.computeIfAbsent((s, dir, "ann"), _ => {
      val prefix = s"graft_ann${tag(dir)}"
      val path = Files.createTempDirectory("graft_ann_idx").toString
      Similarity.buildAnnIndex(Tables.embeddings(s, dir), prefix, path)
      prefix
    })

  /** Standing PQ index (2 fitted Lloyd iterations — q157's fit) over
    * `embeddings` at `dir`; returns its table prefix.
    */
  def pq(s: SparkSession, dir: String): String =
    built.computeIfAbsent((s, dir, "pq"), _ => {
      val prefix = s"graft_pq${tag(dir)}"
      val path = Files.createTempDirectory("graft_pq_idx").toString
      Pq.buildPqIndex(Tables.embeddings(s, dir), prefix, path, iters = 2)
      prefix
    })

  /** Standing IVF-PQ index (q123's fits: 2 coarse Lloyd iterations,
    * seed 7, + 2 residual-codebook iterations) over `embeddings` at
    * `dir`; returns its table prefix.
    */
  def ivfPq(s: SparkSession, dir: String): String =
    built.computeIfAbsent((s, dir, "ivfpq"), _ => {
      val prefix = s"graft_ivfpq${tag(dir)}"
      val path = Files.createTempDirectory("graft_ivfpq_idx").toString
      Pq.buildIvfPqIndex(Tables.embeddings(s, dir), prefix, path)
      prefix
    })
}
