package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import java.nio.file.Files

/** The stored bucketed corpus index for incremental dedup
  * (`Dedup.buildCorpusIndex` + the `*Stored` entry points) — the 100 TB
  * path where the standing corpus is indexed once and every delta joins
  * into the bucketed tables with zero corpus-side exchange.
  *
  * Pins (r8 verdict item #1):
  *  (a) result equality with the in-query recompute path, with and
  *      without a df-cap, for both the cross-match and the full
  *      incremental-decision shapes;
  *  (b) the zero-corpus-exchange plan: every bucketed corpus scan in the
  *      executed delta-join plan sits below NO shuffle exchange.
  */
class StoredIndexSpec extends AnyFunSuite {

  private lazy val docs =
    graft.Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
  // a real split: 4/5 standing corpus, 1/5 incoming delta — plus synthetic
  // near-twins of three corpus docs (one appended token ⇒ J just under 1)
  // so the cross-set near arm is guaranteed non-vacuous regardless of how
  // the generator's own near-dups landed across the split
  private lazy val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
  private lazy val delta = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    .union(docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .orderBy(col("doc_id")).limit(3)
      .select((col("doc_id") + lit(3000000L)).as("doc_id"),
        concat(col("text"), lit(" neartwin")).as("text")))

  private lazy val indexDir: String = {
    val base = Files.createTempDirectory("graft_corpus_index").toString
    Dedup.buildCorpusIndex(corpus, "spec_corpus", base, n = 3, nBuckets = 4)
    base
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("stored cross-matches equal the recompute path (no cap and df-cap)") {
    indexDir // force build
    for (cap <- Seq(None, Some(8))) {
      val recomputed = Dedup.crossJaccardMatches(delta, corpus,
        threshold = 0.5, dfCap = cap)
      val stored = Dedup.crossJaccardMatchesStored(delta, "spec_corpus",
        threshold = 0.5, dfCap = cap)
      val r = sortedRows(recomputed)
      assert(r.nonEmpty, "split produced no cross-set matches — test is vacuous")
      assert(sortedRows(stored) == r, s"dfCap=$cap")
      // cap=8 exceeds this corpus's max shingle df (7), so the capped run
      // must equal the uncapped one — the regression pin for the
      // using-join column-reorder bug this suite caught (a positional
      // toDF after the anti-join joined doc_ids against shingle hashes,
      // so every dfCap≠None call matched nothing)
      if (cap.isDefined) assert(r == sortedRows(
        Dedup.crossJaccardMatches(delta, corpus, threshold = 0.5)))
    }
  }

  test("stored incremental decisions equal the recompute path") {
    indexDir
    // make the exact and batch arms non-vacuous: replay two corpus texts
    // into the delta under fresh ids, and duplicate one delta text within
    // the batch
    val replayed = corpus.orderBy(col("doc_id")).limit(2)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
    val firstDelta = delta.orderBy(col("doc_id")).limit(1)
      .select((col("doc_id") + lit(2000000L)).as("doc_id"), col("text"))
    val batch = delta.union(replayed).union(firstDelta)
    val recomputed = Dedup.incrementalDedup(batch, corpus, threshold = 0.5)
    val stored = Dedup.incrementalDedupStored(batch, "spec_corpus", threshold = 0.5)
    val r = sortedRows(recomputed)
    assert(sortedRows(stored) == r)
    val byKeep = recomputed.groupBy(col("keep")).count().collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(byKeep.getOrElse(0L, 0L) >= 3L, s"dup signals vacuous: $byKeep")
  }

  test("delta join plans with zero corpus-side exchange (bucketed scans at the leaves)") {
    indexDir
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // plain physical plan (AQE off) so the tree walk below is direct; the
    // bucketed-scan property itself does not depend on AQE
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Dedup.crossJaccardMatchesStored(delta, "spec_corpus",
        threshold = 0.5, dfCap = Some(8)).queryExecution.executedPlan
      // for every bucketed corpus scan: the ancestor path up to the FIRST
      // join must hold no shuffle — the corpus rows flow from disk into
      // their join re-using the bucket layout. (Exchanges higher up — over
      // joined/aggregated DELTA-sized results — are the plan working as
      // intended, so the walk stops at the join.)
      def scanPaths(p: SparkPlan,
          anc: List[SparkPlan]): Seq[(FileSourceScanExec, List[SparkPlan])] =
        p match {
          case s: FileSourceScanExec if s.relation.bucketSpec.isDefined =>
            Seq((s, anc))
          case other => other.children.flatMap(c => scanPaths(c, other :: anc))
        }
      val found = scanPaths(plan, Nil)
      assert(found.size == 2,
        s"expected postings+sizes bucketed scans, got ${found.size}:\n$plan")
      found.foreach { case (scan, ancestors) =>
        val toJoin = ancestors.takeWhile(
          !_.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
        assert(!toJoin.exists(_.isInstanceOf[ShuffleExchangeExec]),
          s"corpus-side exchange between ${scan.tableIdentifier} and its join:\n$plan")
      }
      // df-cap reaches the scan as a pushed filter, not a post-join one
      val postingsScan = found.map(_._1).find(_.output.exists(_.name == "df")).get
      assert(postingsScan.metadata.getOrElse("PushedFilters", "")
        .contains("LessThanOrEqual(df,8)"), postingsScan.metadata.toString)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("index tables drop cleanly") {
    indexDir
    for (t <- Seq("spec_corpus_postings", "spec_corpus_sizes", "spec_corpus_exact"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
    assert(!spark.catalog.tableExists("spec_corpus_postings"))
  }
}
