package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Eval-set decontamination: exact n-gram overlap detection (the GPT-3
  * appendix-C check) plus the PaLM-style span-removal POLICY layer — merge
  * matched windows into maximal spans, budget the cut, and rewrite the
  * text with the spans excised so a contaminated doc is salvaged instead
  * of dropped.
  *
  * Shared by q143 (per-doc overlap audit) and q147 (span-removal budget):
  * both derive from ONE [[gramHits]] pipeline so the split convention,
  * window hashing, and guard algebra cannot drift between the audit and
  * the policy that acts on it (the r9 "duplicated load-bearing schema"
  * lesson).
  *
  * 100 TB notes: the gram join is deliberately UNHINTED — a real
  * benchmark eval side is MBs and lands as an AQE runtime broadcast; an
  * in-corpus split degrades to a hash join of two slim (h, id) posting
  * streams (q127's shuffle class). Span merging is a per-doc windowed
  * sweep over HIT rows only (contaminated docs × matched windows — tiny
  * relative to the corpus), and the text rewrite is a per-row projection.
  */
object Decontam {

  /** Deterministic train/eval split bucket in [0, 100) — q143's
    * convention (multiplicative hash of doc_id; the test split is the
    * bucket tail, with a held-back gap so val-split docs are neither
    * eval nor train).
    */
  def bucketOf(docId: Column): Column = pmod(docId * lit(2654435761L), lit(100))

  /** (doc_id, i, h): every n-token window of every doc, as a 1-based
    * start position plus the window's gram hash — the ONE gram/hash
    * definition every decontamination face shares (batch audit q143,
    * span policy q147, streaming screen DecontamStream). The 13-gram
    * hash is md5 for the DuckDB twin; at 100 TB use xxhash64 (q127's
    * documented substitution).
    */
  def grams(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      // guard BEFORE sequence(): sequence(1, n) with n < 1 DESCENDS
      .filter(size(col("t")) >= n)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), size(col("t")) - lit(n - 1))).as("i"))
      .select(col("doc_id"), col("i"),
        md5(concat_ws(" ", slice(col("t"), col("i"), lit(n)))).as("h"))

  /** Matched-window hits: one row per (train doc_id, window start i,
    * gram hash h, eval_doc) where the train doc's exact `n`-gram at
    * position i also occurs in the eval split. Window starts are
    * 1-based; the window covers tokens [i, i+n-1].
    */
  def gramHits(docs: DataFrame, n: Int = 13,
      evalFloor: Int = 95, trainCeil: Int = 90): DataFrame = {
    val base = docs.withColumn("bucket", bucketOf(col("doc_id")))
    val ev = grams(base.filter(col("bucket") >= evalFloor), n)
      .select(col("h"), col("doc_id").as("eval_doc")).distinct()
    val tr = grams(base.filter(col("bucket") < trainCeil), n)
    tr.join(ev, "h")
  }

  /** Merge matched windows into maximal removal spans per doc:
    * overlapping or adjacent windows ([i, i+n-1] with the next start at
    * most prev_hi + 1) coalesce into one span — the classic
    * gaps-and-islands sweep, partitioned by doc and ordered by window
    * start, so the sort is per-doc over hit rows only. Returns
    * (doc_id, span_id, lo, hi) with 1-based inclusive token bounds.
    */
  def mergedSpans(hits: DataFrame, n: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    hits.select(col("doc_id"), col("i")).distinct()
      .withColumn("prev_hi",
        max(col("i") + lit(n - 1)).over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("is_new",
        when(col("prev_hi").isNull || col("i") > col("prev_hi") + 1, 1L).otherwise(0L))
      .withColumn("span_id",
        sum(col("is_new")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("i")).as("lo"), (max(col("i")) + lit(n - 1)).as("hi"))
  }

  /** Apply the span-removal policy: rewrite `text` with every span's
    * tokens excised (tokens re-joined on single spaces). Docs with no
    * spans pass through unchanged. Pure per-row expression work after a
    * doc_id-keyed join against the (small) span table — no shuffle of
    * the text beyond that join at any corpus size.
    */
  def scrubText(docs: DataFrame, spans: DataFrame): DataFrame = {
    val spanArr = spans.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("lo"), col("hi"))).as("__spans"))
    docs.join(spanArr, Seq("doc_id"), "left")
      .withColumn("clean_text",
        when(col("__spans").isNull, col("text"))
          .otherwise(concat_ws(" ",
            filter(split(col("text"), " "), (t, idx) =>
              !exists(col("__spans"), sp =>
                idx + 1 >= sp.getField("lo") && idx + 1 <= sp.getField("hi"))))))
      .drop("__spans")
  }
}
