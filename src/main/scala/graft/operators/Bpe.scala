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
}
