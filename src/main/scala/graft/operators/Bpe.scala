package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative BPE merge training (r10 verdict #5) — the real
  * tokenizer-training job that q110's single pair-count round feeds:
  * repeat { count adjacent token pairs; pick the most frequent pair
  * (total order: count DESC, left, right); apply the merge greedily
  * left-to-right; } for a fixed number of rounds, returning the merge
  * table. This is the Sennrich et al. 2016 subword-unit loop expressed
  * over whitespace tokens (the corpus' unit here; byte-level BPE swaps
  * the tokenizer, not the loop).
  *
  * Spark-first shape, the connected-components discipline applied to a
  * training loop:
  *  - per round, the distributed work is ONE pair-count aggregate
  *    (map-side combined (l, r) counts — exactly q110's job) with a
  *    TakeOrdered(1) head, and ONE merge projection over the corpus;
  *  - the winning pair is a 1-row driver read per round (the DqChecks
  *    scalar-fold contract, not a data collect);
  *  - the re-tokenized corpus localCheckpoints each round so round k's
  *    plan does not re-derive rounds 1..k-1 (lineage truncation, and the
  *    superseded checkpoint is released eagerly like components');
  *  - the merge application is a per-row linear fold (greedy
  *    non-overlapping left-to-right, the standard one-pass-per-round
  *    rule: within a run of overlapping candidates the 1st, 3rd, 5th …
  *    merge and the rest are consumed).
  *
  * Determinism: integer counts, binary-collated string tie-breaks, and a
  * greedy rule with no ordering freedom — identical merge tables on any
  * partitioning/cluster size, which is what lets q155's DuckDB twin
  * replay all rounds (as a gaps-and-islands parity rewrite of the same
  * greedy rule) and hash-match.
  */
object Bpe {

  /** Merged-token joiner: U+0001, a control char that CANNOT occur inside
    * a whitespace token of any sane corpus — an underscore joiner made
    * the merge output "a_b" collide with a literal corpus token "a_b"
    * (tokens are arbitrary non-space strings), so later rounds' pair
    * counts conflated distinct token sequences. With a reserved
    * separator the merged string uniquely encodes its base-token
    * sequence, which is exactly the string identity real BPE vocabs key
    * on (two merge histories covering the same base sequence ARE the
    * same token). The DuckDB twin joins with chr(1) to match.
    */
  val Joiner = "\u0001"

  /** Greedy left-to-right application of ONE merge (l, r) → l+Joiner+r over a
    * token-array column: a sequential fold over positions carrying
    * (output-so-far, consumed-flag). The pair test compares
    * slice(t, i, 2) against [l, r] — slice past the end returns a short
    * array and the equality safely fails, so no out-of-bounds
    * element_at under ANSI mode. O(len) comparisons per row; the fold
    * itself is the per-row linear transform a 100 TB merge round ships
    * to every executor.
    */
  def applyMerge(tokens: Column, l: String, r: String): Column = {
    val merged = lit(l + Joiner + r)
    val pair = array(lit(l), lit(r))
    aggregate(
      sequence(lit(1), size(tokens)),
      struct(
        array().cast("array<string>").as("out"),
        lit(false).as("skip")),
      (acc, i) => {
        val take = acc.getField("skip")
        val isPair = slice(tokens, i, lit(2)) === pair
        struct(
          when(take, acc.getField("out"))
            .when(isPair, concat(acc.getField("out"), array(merged)))
            .otherwise(concat(acc.getField("out"), array(element_at(tokens, i))))
            .as("out"),
          (!take && isPair).as("skip"))
      },
      acc => acc.getField("out"))
  }

  /** Adjacent-pair counts of a (t: array<string>) frame — q110's job. */
  private def pairCounts(cur: DataFrame): DataFrame =
    cur.where(size(col("t")) >= 2)
      .select(col("t"), explode(sequence(lit(1), size(col("t")) - 1)).as("i"))
      .select(
        element_at(col("t"), col("i")).as("l"),
        element_at(col("t"), col("i") + 1).as("r"))
      .groupBy(col("l"), col("r"))
      .agg(count(lit(1)).as("cnt"))

  /** Train `rounds` merges over `docs.text`; returns the merge table
    * (round, l, r, cnt) with cnt = the pair's corpus count at pick time.
    * Stops early if no adjacent pair remains.
    */
  def train(docs: DataFrame, rounds: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var cur = Par.fanOut(docs.select(split(col("text"), " ").as("t")))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    for (round <- 1 to rounds if !exhausted) {
      val top = pairCounts(cur)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect() // 1 row — the round's winning pair (scalar read)
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((round.toLong, l, r, cnt))
        val next = cur.select(applyMerge(col("t"), l, r).as("t"))
          .localCheckpoint(true)
        Dedup.release(cur) // superseded checkpoint — free its blocks
        cur = next
      }
    }
    Dedup.release(cur)
    merges.toSeq.toDF("round", "l", "r", "cnt")
  }

  // -----------------------------------------------------------------------
  // VOCAB APPLY — the ENCODE half of the tokenizer (r12 verdict #4): q155
  // trains merges; the thing a training pipeline actually runs nightly is
  // applying a STORED vocabulary to the corpus, producing token-id
  // arrays. The artifact is two small parquet tables (`$path/merges`:
  // the ordered merge list; `$path/vocab`: (token, id) for every final
  // token of the training corpus — base tokens and merge products alike,
  // ids dense-ranked by token string so both engines assign identically).
  // Encoding at 100 TB: the merge application is the same per-row linear
  // fold as training (zero shuffles), the id mapping is a broadcast join
  // against the vocab artifact (the corpus never shuffles for it), and
  // the only corpus-keyed exchange is the per-doc reassembly aggregate —
  // which [[encodeStoredFlat]] (the oracle/query shape) skips entirely.
  // -----------------------------------------------------------------------

  /** Apply a trained merge list in ROUND ORDER to a (…, t: array<string>)
    * frame — one greedy left-to-right [[applyMerge]] PROJECTION per
    * merge with an eager localCheckpoint between rounds, exactly the
    * train() discipline and for the same reason: composing the merges
    * into ONE nested expression tree multiplies evaluation cost per
    * level (higher-order-function lambdas get no common-subexpression
    * elimination — a naive 3-merge fold ran MINUTES over 500 docs where
    * the staged form takes milliseconds). Intermediate checkpoints
    * release eagerly; the FINAL frame's blocks follow the
    * consumer-release contract (Similarity.lshScoredPairs scaladoc) —
    * storeVocab releases them itself, encode's consumer (collect/write,
    * or the harness sweep) owns them.
    */
  private def applyMergesStaged(frame: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    var cur = frame.localCheckpoint(true)
    merges.foreach { case (l, r) =>
      val next = cur.withColumn("t", applyMerge(col("t"), l, r))
        .localCheckpoint(true)
      Dedup.release(cur)
      cur = next
    }
    cur
  }

  /** Driver fold of a merge table: (l, r) pairs in round order — a
    * vocab-sized artifact (the codebook-literal contract, not a data
    * collect).
    */
  private def mergeList(merges: DataFrame): Seq[(String, String)] =
    merges.orderBy(col("round")).collect()
      .map(r => (r.getAs[String]("l"), r.getAs[String]("r"))).toSeq

  /** Store the trained tokenizer artifact under `path`: the merge table
    * plus the (token, id) vocabulary of the training corpus AFTER all
    * merges. Ids are dense 0-based ranks by binary token order — the
    * deterministic total order both engines share — assigned with a
    * global window over the VOCAB frame (vocabulary-sized, the standard
    * small-artifact single-partition sort, never the corpus).
    */
  def storeVocab(docs: DataFrame, merges: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    merges.coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
    val ms = mergeList(merges)
    val staged = applyMergesStaged(
      Par.fanOut(docs.select(split(col("text"), " ").as("t"))), ms)
    val vocab = staged
      .select(explode(col("t")).as("token")).distinct()
      .withColumn("id",
        (row_number().over(Window.orderBy(col("token"))) - 1).cast("long"))
    vocab.coalesce(1).write.mode("overwrite").parquet(s"$path/vocab")
    Dedup.release(staged) // vocab is on disk — free the merge-stage blocks
  }

  /** Ordered merge list from a stored artifact. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession, path: String): Seq[(String, String)] =
    mergeList(spark.read.parquet(s"$path/merges"))

  /** Encode `docs.text` against a stored artifact, FLAT shape:
    * (doc_id, pos, token_id), pos 1-based over the doc's final token
    * list, OOV tokens → −1 (impossible on the training corpus itself —
    * the round-trip property BpeSpec pins). This is the zero-reassembly
    * shape: merge fold + posexplode + broadcast vocab join, no per-doc
    * aggregate at all — and the hash-friendly one q162's oracle compares.
    */
  def encodeStoredFlat(spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame, path: String): DataFrame =
    encodeFlat(docs, loadMerges(spark, path), spark.read.parquet(s"$path/vocab"))

  private def encodeFlat(docs: DataFrame, ms: Seq[(String, String)],
      vocab: DataFrame): DataFrame =
    applyMergesStaged(
      Par.fanOut(docs.select(col("doc_id"), split(col("text"), " ").as("t"))), ms)
      .select(col("doc_id"), posexplode(col("t")).as(Seq("pos0", "token")))
      // NO forced broadcast hint: a real vocab (32k-256k rows) is
      // broadcast-SIZED and the optimizer picks that automatically; a
      // pathological one should degrade to a shuffle join, not an OOM —
      // the ScaleGuardSpec forced-broadcast rule
      .join(vocab, Seq("token"), "left")
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        coalesce(col("id"), lit(-1L)).as("token_id"))

  /** Encode to token-id ARRAYS — (doc_id, token_ids) — the training-data
    * payload shape: the flat encode plus one per-doc reassembly
    * aggregate (order restored from pos inside the collected list, so
    * the shuffle carries slim (doc_id, pos, id) rows only).
    */
  def encodeStored(spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame, path: String): DataFrame =
    encodeStoredFlat(spark, docs, path)
      .groupBy(col("doc_id"))
      .agg(transform(
        sort_array(collect_list(struct(col("pos").as("pos"), col("token_id").as("tid")))),
        s => s.getField("tid")).as("token_ids"))

  /** Decode token-id arrays back to text: id → token via the stored
    * vocab, merge products split on [[Joiner]] back into base tokens,
    * space-joined — decode(encode(x)) == x on the training corpus
    * (BpeSpec round-trip property; the joiner being a reserved control
    * char is exactly what makes the split lossless).
    */
  def decodeStored(spark: org.apache.spark.sql.SparkSession,
      encoded: DataFrame, path: String): DataFrame = {
    val vocab = spark.read.parquet(s"$path/vocab")
      .select(col("id").as("token_id"), col("token"))
    encoded.select(col("doc_id"), posexplode(col("token_ids")).as(Seq("pos", "token_id")))
      .join(vocab, "token_id") // size-based broadcast, see encodeFlat
      .select(col("doc_id"), col("pos"), split(col("token"), Joiner).as("base"))
      .groupBy(col("doc_id"))
      .agg(array_join(flatten(transform(
        sort_array(collect_list(struct(col("pos").as("pos"), col("base").as("base")))),
        s => s.getField("base"))), " ").as("text"))
  }
}
