package graft.queries

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit, pmod}
import graft.Tables
import graft.operators.{IndexOps, Pq, Similarity}

/** Build-once/query-many plumbing for the stored-index queries (q158 /
  * q159 / q160 / q161): the first invocation per (session, sfDir) builds
  * the standing index into a deterministic temp directory and registers
  * its bucketed tables; every later invocation — Bench's timed reps
  * after the untimed warmup, which is exactly the build-once/query-many
  * cost a training pipeline sees — pays only the probe. The memo key
  * includes the session (as its UUID string — see [[Tables.sessionKey]])
  * because table registrations die with it (in-memory catalog); a fresh
  * JVM rebuilds from the source parquet, which is also what keeps the
  * soak's CPUS=3-vs-8 determinism sweep honest (two JVMs, two
  * independent builds, bit-identical query output required).
  *
  * Advisor-r12 fixes carried by this shape:
  *  - the dir tag is a SHA-1 prefix of the RAW dir string (the old
  *    `[^A-Za-z0-9]->_` sanitization collapsed distinct dirs onto one
  *    table prefix, so the second build overwrote the first while its
  *    memo entry still vouched for it);
  *  - the memo keys on the session UUID, not the session object, and
  *    its values are plain strings — a stopped session is not pinned;
  *  - index data lands under a DETERMINISTIC per-prefix path in
  *    java.io.tmpdir, so a rebuild (new session, same corpus) overwrites
  *    in place instead of leaking one createTempDirectory per build.
  */
private[queries] object StoredIndexes {

  private val built = new ConcurrentHashMap[(String, String, String), String]()

  /** Collision-proof dir tag: first 6 bytes of SHA-1(dir) in hex — a
    * legal identifier fragment, injective-in-practice over raw dirs.
    */
  private def tag(dir: String): String =
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(dir.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString

  /** Deterministic per-prefix index location (reused across rebuilds). */
  private def indexPath(prefix: String): String =
    java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_idx_$prefix").toString

  private def memo(s: SparkSession, dir: String, kind: String)(
      build: (String, String) => Unit): String =
    built.computeIfAbsent((Tables.sessionKey(s), dir, kind), _ => {
      val prefix = s"graft_${kind}_${tag(dir)}"
      build(prefix, indexPath(prefix))
      prefix
    })

  /** Standing LSH ANN index over `embeddings` at `dir`; returns its
    * table prefix.
    */
  def ann(s: SparkSession, dir: String): String =
    memo(s, dir, "ann") { (prefix, path) =>
      Similarity.buildAnnIndex(Tables.embeddings(s, dir), prefix, path)
    }

  /** Standing LSH ANN index WITH a tombstoned deletion set (q161): the
    * same build as [[ann]] under its own prefix, then every
    * vec_id ≡ 0 (mod 7) tombstoned as maintenance batch 0 — the
    * deterministic stand-in for a dedup/decontam DROP decision. Probes
    * against this prefix must never retrieve (or anchor on) a
    * tombstoned vector; StoredTombstoneSpec pins row-identity with a
    * rebuild from the surviving corpus.
    */
  def annTombstoned(s: SparkSession, dir: String): String =
    memo(s, dir, "annts") { (prefix, path) =>
      val emb = Tables.embeddings(s, dir)
      Similarity.buildAnnIndex(emb, prefix, path)
      IndexOps.tombstone(s, prefix,
        emb.filter(pmod(col("vec_id"), lit(7)) === 0).select(col("vec_id")),
        batchId = 0L)
    }

  /** Standing PQ index (2 fitted Lloyd iterations — q157's fit) over
    * `embeddings` at `dir`; returns its table prefix.
    */
  def pq(s: SparkSession, dir: String): String =
    memo(s, dir, "pq") { (prefix, path) =>
      Pq.buildPqIndex(Tables.embeddings(s, dir), prefix, path, iters = 2)
      ()
    }

  /** Standing IVF-PQ index (q123's fits: 2 coarse Lloyd iterations,
    * seed 7, + 2 residual-codebook iterations) over `embeddings` at
    * `dir`; returns its table prefix.
    */
  def ivfPq(s: SparkSession, dir: String): String =
    memo(s, dir, "ivfpq") { (prefix, path) =>
      Pq.buildIvfPqIndex(Tables.embeddings(s, dir), prefix, path)
    }

  /** Standing SQ8 index (per-dim min/max fit — deterministic, which is
    * what lets q168 carry a full oracle) over `embeddings` at `dir`;
    * returns its table prefix.
    */
  def sq8(s: SparkSession, dir: String): String =
    memo(s, dir, "sq8") { (prefix, path) =>
      graft.operators.Sq8.buildSq8Index(Tables.embeddings(s, dir), prefix, path)
    }

  /** Standing BM25 lexical index (stored inverted postings — exact
    * integers, so q169/q170 carry q131/q146's full oracles) over
    * `documents` at `dir`; returns its table prefix.
    */
  def lex(s: SparkSession, dir: String): String =
    memo(s, dir, "lex") { (prefix, path) =>
      graft.operators.Lexical.buildLexIndex(Tables.documents(s, dir), prefix, path)
    }

  /** Standing lexical index WITH a tombstoned deletion set (q171): the
    * same build as [[lex]] under its own prefix, then every
    * doc_id ≡ 0 (mod 7) tombstoned as deletion batch 0 (the q161
    * stand-in for a dedup/decontam DROP decision). Unlike the LSH
    * family, the deletion-adjusted probe stays EXACTLY SQL-replayable
    * (df/N/total-length shrink by integer arithmetic), so q171 is the
    * first stored+tombstoned probe with a full DuckDB oracle.
    */
  def lexTombstoned(s: SparkSession, dir: String): String =
    memo(s, dir, "lexts") { (prefix, path) =>
      val docs = Tables.documents(s, dir)
      graft.operators.Lexical.buildLexIndex(docs, prefix, path)
      graft.operators.Lexical.tombstoneDocs(s, prefix,
        docs.filter(pmod(col("doc_id"), lit(7)) === 0).select(col("doc_id")),
        batchId = 0L)
    }

  /** Standing semantic-dedup cluster index (q178): frozen seeded
    * centroids + the cluster-bucketed members table, built over the
    * vec_id >= 100 slice so the registered screen has a deterministic
    * out-of-index incoming batch (vec_id < 100) to decide on — the
    * read-only q176 pattern: the screen itself appends nothing, so the
    * memoized state stays a pure function of `embeddings` and the query
    * carries a full oracle.
    */
  def sem(s: SparkSession, dir: String): String =
    memo(s, dir, "sem") { (prefix, path) =>
      graft.operators.SemDedup.buildSemIndex(
        Tables.embeddings(s, dir).filter(col("vec_id") >= 100), prefix, path)
    }

  /** q176's deterministic maintenance state: an SQ8 index (the
    * deterministic min/max fit — the q168/q172 rationale) built over
    * vec_id >= 100, grown by an in-range batch 0 (vec_id < 50) and a
    * DRIFTED batch 1 (vec_id in [50,100), every coordinate +2.0f — the
    * whole batch clamps against the frozen range with >= 1.0 margin at
    * every test scale, so the monitor alert is scale-independent and
    * immune to float-vs-double shift rounding), then vec_id ≡ 3 (mod 9)
    * tombstoned as deletion batch 0 (~11% > the 10% compact bar, so two
    * triggers are live and the policy's refit-over-compact precedence
    * is what the oracle checks). Every statistic the policy reads is an
    * exact integer function of `embeddings`, which is what lets q176
    * carry a FULL DuckDB oracle.
    */
  def sq8Policy(s: SparkSession, dir: String): String =
    memo(s, dir, "pol") { (prefix, path) =>
      val emb = Tables.embeddings(s, dir)
      graft.operators.Sq8.buildSq8Index(
        emb.filter(col("vec_id") >= 100), prefix, path)
      graft.streaming.AnnStream.indexBatchSq8(
        s, emb.filter(col("vec_id") < 50), 0L, prefix)
      graft.streaming.AnnStream.indexBatchSq8(
        s, emb.filter(col("vec_id") >= 50 && col("vec_id") < 100)
          .select(col("vec_id"),
            org.apache.spark.sql.functions.transform(col("embedding"),
              x => x + lit(2.0f)).as("embedding")),
        1L, prefix)
      IndexOps.tombstone(s, prefix,
        emb.filter(pmod(col("vec_id"), lit(9)) === 3).select(col("vec_id")),
        batchId = 0L)
    }
}
