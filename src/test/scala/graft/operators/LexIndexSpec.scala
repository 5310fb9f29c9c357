package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import graft.streaming.LexStream
import java.nio.file.{Files, Path}

/** The stored BM25 inverted index (r13 verdict #1): probes must be
  * bit-identical to the q131 recompute over the same corpus, streaming
  * growth must keep that identity batch by batch under the
  * append-if-absent replay discipline, deletions must shrink df/N/total
  * length exactly (rebuild identity), and compaction must fold the
  * batch partitions while keeping every probe row-identical. The
  * sf0.01 DuckDB oracles for q169/q170/q171 pin the same contract
  * against an independent engine; this spec covers the lifecycle arms
  * no SQL twin can express (streams, crashes, rewrites).
  */
class LexIndexSpec extends AnyFunSuite {

  private lazy val docs = graft.Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("text"))
  private val terms = graft.queries.DocQueries.bm25Terms

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def dropAll(prefix: String): Unit =
    Seq("postings", "doclen", "stats", "tombstones", "meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$t"))

  /** Reference answer: a fresh throwaway index built directly over
    * `corpus` — rebuild identity is the deletion/compaction contract.
    */
  private def rebuilt(corpus: DataFrame, tag: String): Seq[String] = {
    val base = Files.createTempDirectory(s"lex_ref_$tag")
    Lexical.buildLexIndex(corpus, s"lexref_$tag", s"$base/idx")
    val out = sortedRows(Lexical.bm25TopKStored(spark, s"lexref_$tag", terms))
    dropAll(s"lexref_$tag")
    out
  }

  private def stageSlice(df: DataFrame, inbox: Path, name: String): Unit = {
    val tmp = Files.createTempDirectory("lex_slice").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.createDirectories(inbox)
    Files.move(part.toPath, inbox.resolve(name))
  }

  test("stored probe equals a full-corpus build; stream growth keeps identity; crash replay fills exactly the missing slices") {
    val base = Files.createTempDirectory("lex_stream")
    val inbox = base.resolve("inbox")
    // seed with the LATE ids only — the query terms' hits arrive through
    // the STREAM across two micro-batches, so a correct top-20 proves
    // cross-batch freshness of postings, doclen AND the stats increments
    Lexical.buildLexIndex(docs.filter(col("doc_id") >= 100), "lx", s"$base/idx")
    stageSlice(docs.filter(col("doc_id") < 50), inbox, "slice0.parquet")
    stageSlice(docs.filter(col("doc_id") >= 50 && col("doc_id") < 100),
      inbox, "slice1.parquet")
    LexStream.maintainLex(
      spark.readStream.schema(graft.streaming.DedupStream.docSchema)
        .option("maxFilesPerTrigger", 1).parquet(inbox.toString),
      "lx", s"$base/ckpt").awaitTermination()
    val batchIds = IndexOps.batchIdsOf(spark, "lx_postings")
    assert(batchIds == Set(-1L, 0L, 1L), s"partitions: $batchIds")
    val grown = sortedRows(Lexical.bm25TopKStored(spark, "lx", terms))
    assert(grown.nonEmpty && grown == rebuilt(docs, "full"))

    // CRASH REPLAY: batch 2 landed postings+doclen, died before stats —
    // the replay must fill EXACTLY the stats slice, never duplicate
    val ghost = docs.filter(col("doc_id") < 3)
      .select((col("doc_id") + 7000L).as("doc_id"), col("text"))
    val (p2, d2, _) = Lexical.lexIndexSlices(ghost, 2L)
    graft.sources.Bucketing.appendBucketedPartition(p2, "lx_postings")
    graft.sources.Bucketing.appendBucketedPartition(d2, "lx_doclen")
    // the half-landed batch blocks compaction loudly...
    val ex = intercept[IllegalArgumentException] {
      Lexical.compactLexIndex(spark, "lx", s"$base/idx")
    }
    assert(ex.getMessage.contains("stats missing batch 2"), ex.getMessage)
    // ...and the healing replay fills exactly the missing slice
    LexStream.indexBatchLex(spark, ghost, 2L, "lx")
    assert(spark.table("lx_stats").filter(col("batch_id") === 2L).count() == 1)
    val pCount = spark.table("lx_postings").filter(col("batch_id") === 2L).count()
    LexStream.indexBatchLex(spark, ghost, 2L, "lx") // full replay = no-op
    assert(spark.table("lx_postings").filter(col("batch_id") === 2L).count() == pCount)
    assert(spark.table("lx_stats").filter(col("batch_id") === 2L).count() == 1)

    // RESTART: catalog dies, files survive, reattach restores the probe
    dropAll("lx")
    Lexical.reattachLexIndex(spark, "lx", s"$base/idx")
    val afterRestart = sortedRows(Lexical.bm25TopKStored(spark, "lx", terms))
    assert(afterRestart == rebuilt(docs.union(ghost), "ghosted"))
    dropAll("lx")
  }

  test("probe plan: the term filter reaches the postings scan pushed; the doclen join holds no corpus-side exchange; batch probe equals per-query probes") {
    val base = Files.createTempDirectory("lex_plan")
    Lexical.buildLexIndex(docs, "lxp", s"$base/idx")
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Lexical.bm25TopKStored(spark, "lxp", terms)
        .queryExecution.executedPlan
      def scans(p: SparkPlan,
          anc: List[SparkPlan]): Seq[(FileSourceScanExec, List[SparkPlan])] =
        p match {
          case s: FileSourceScanExec if s.relation.bucketSpec.isDefined =>
            Seq((s, anc))
          case other => other.children.flatMap(c => scans(c, other :: anc))
        }
      val found = scans(plan, Nil)
      // the term filter is PUSHED to the postings scan — at 100 TB the
      // probe reads |terms| inverted-index slices, never the corpus
      val postingsScan = found.map(_._1)
        .find(_.output.exists(_.name == "token")).get
      assert(postingsScan.metadata.getOrElse("PushedFilters", "")
        .contains("In(token"), postingsScan.metadata.toString)
      // the doc_id-bucketed doclen scan flows into its join with no
      // exchange above it (the StoredIndexSpec walk)
      val doclenScan = found
        .find { case (s, _) => s.output.exists(_.name == "dl") }.get
      val toJoin = doclenScan._2.takeWhile(
        !_.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
      assert(!toJoin.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"corpus-side exchange above the doclen scan:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    // the batched probe is per-query identical to k separate probes
    // (df/stats are query-independent — the single-scan fan-out cannot
    // change a score)
    val batch = Seq(0L -> Seq("spark", "merge"), 1L -> terms)
    val got = Lexical.bm25BatchTopKStored(spark, "lxp", batch, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val expected = batch.flatMap { case (qid, ts) =>
      Lexical.bm25TopKStored(spark, "lxp", ts, k = 5).collect()
        .map(r => (qid, r.getLong(0), r.getLong(1), r.getLong(2)))
    }.toSet
    assert(got.nonEmpty && got == expected,
      s"batch probe != per-query probes:\n$got\n$expected")
    dropAll("lxp")
  }

  test("ONE streamed deletion decision reaches both doc-keyed indexes: the BM25 probe drops the doc AND the dedup screen stops suppressing its duplicates") {
    val base = Files.createTempDirectory("lex_del")
    Lexical.buildLexIndex(docs, "lxd", s"$base/lex")
    graft.streaming.DedupStream.seedCorpusIndex(docs, "dcd", s"$base/dedup")
    // the victim: a doc the standing BM25 index actually RETRIEVES now
    val victim = Lexical.bm25TopKStored(spark, "lxd", terms, k = 1)
      .collect()(0).getLong(0)
    val victimText = docs.filter(col("doc_id") === victim)
      .collect()(0).getString(1)
    import spark.implicits._
    stageSlice(Seq(victim).toDF("doc_id"), base.resolve("del_inbox"), "dec0.parquet")
    graft.streaming.AnnStream.maintainTombstones(
      graft.streaming.AnnStream.readDocDeletes(spark, s"$base/del_inbox"),
      Seq("lxd", "dcd"), s"$base/ckpt", keyCol = "doc_id").awaitTermination()
    // lexical index: the victim is unretrievable, answers = rebuild
    val after = sortedRows(Lexical.bm25TopKStored(spark, "lxd", terms))
    assert(!after.exists(_.startsWith(s"[$victim,")))
    assert(after == rebuilt(docs.filter(col("doc_id") =!= victim), "deld"))
    // dedup index: the victim's text no longer matches the exact arm —
    // screened as batch 1 (the N -> N+1 visibility contract: a decision
    // recorded under delete-batch 0 is fenced for same-id batch 0 and
    // visible from batch 1 on, AnnStreamSpec's semantics)
    val probeDir = s"$base/dec"
    graft.streaming.DedupStream.screenBatchStored(spark,
      Seq((777777L, victimText)).toDF("doc_id", "text"), 1L, "dcd", probeDir)
    val d = spark.read.parquet(s"$probeDir/batch_id=1").collect()(0)
    assert(d.isNullAt(d.fieldIndex("exact_dup_of")),
      s"deleted doc still suppresses its duplicate: $d")
    dropAll("lxd")
    Seq("postings", "sizes", "exact", "tombstones", "meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS dcd_$t"))
  }

  test("tombstoned deletion shrinks df/N/total-length exactly (rebuild identity); compaction folds partitions, keeps answers, fences replays") {
    val base = Files.createTempDirectory("lex_ts")
    Lexical.buildLexIndex(docs.filter(col("doc_id") >= 100), "lxt", s"$base/idx")
    val batch0 = docs.filter(col("doc_id") < 50)
    val batch1 = docs.filter(col("doc_id") >= 50 && col("doc_id") < 100)
    LexStream.indexBatchLex(spark, batch0, 0L, "lxt")
    LexStream.indexBatchLex(spark, batch1, 1L, "lxt")
    val drops = docs.filter(pmod(col("doc_id"), lit(7)) === 0).select(col("doc_id"))
    Lexical.tombstoneDocs(spark, "lxt", drops, batchId = 0L)
    val survivors = docs.join(drops, Seq("doc_id"), "left_anti")
    val expected = rebuilt(survivors, "surv")
    val tombstoned = sortedRows(Lexical.bm25TopKStored(spark, "lxt", terms))
    assert(tombstoned.nonEmpty && tombstoned == expected,
      "tombstoned probe != rebuild from survivors")

    val filesBefore = spark.table("lxt_postings").inputFiles.length
    Lexical.compactLexIndex(spark, "lxt", s"$base/idx")
    // row identity, physically purged, stats re-derived, fences advanced
    assert(sortedRows(Lexical.bm25TopKStored(spark, "lxt", terms)) == expected)
    assert(spark.table("lxt_tombstones").count() == 0)
    assert(IndexOps.batchIdsOf(spark, "lxt_postings") == Set(1L))
    val st = spark.table("lxt_stats").collect()
    assert(st.length == 1 &&
      st(0).getAs[Long]("n_docs") == survivors.count(),
      s"stats after compaction: ${st.mkString(";")}")
    val filesAfter = spark.table("lxt_postings").inputFiles.length
    assert(filesAfter <= 8 && filesAfter < filesBefore,
      s"postings files $filesBefore -> $filesAfter (nBuckets = 8)")
    // pre-compaction replay is fenced (batch 1 was folded away)...
    val rowsNow = spark.table("lxt_doclen").count()
    LexStream.indexBatchLex(spark, batch1, 1L, "lxt")
    assert(spark.table("lxt_doclen").count() == rowsNow)
    // ...while genuinely new batches land and are retrievable
    val fresh = docs.filter(col("doc_id") < 5)
      .select((col("doc_id") + 9000L).as("doc_id"), col("text"))
    LexStream.indexBatchLex(spark, fresh, 2L, "lxt")
    assert(sortedRows(Lexical.bm25TopKStored(spark, "lxt", terms)) ==
      rebuilt(survivors.union(fresh), "survfresh"))
    dropAll("lxt")
  }

  test("advisor r14: empty batches append nothing, malformed rows share one contract across build paths, cross-table swap crashes recover automatically") {
    import spark.implicits._
    val base = Files.createTempDirectory("lex_r14")
    // MALFORMED-ROW CONTRACT: a NULL-text row in the BATCH build is
    // dropped exactly as the streaming path drops it — the index over
    // (docs + null rows) is bit-identical to the index over docs
    val polluted = docs.union(
      Seq((Some(8888L), Option.empty[String]), (Option.empty[Long], Some("orphan text")))
        .toDF("doc_id", "text"))
    Lexical.buildLexIndex(polluted, "lxc", s"$base/idx")
    assert(sortedRows(Lexical.bm25TopKStored(spark, "lxc", terms)) ==
      rebuilt(docs, "clean"),
      "null rows in the batch build skewed the index")
    assert(spark.table("lxc_doclen")
      .filter(col("doc_id") === 8888L || col("doc_id").isNull).count() == 0)

    // EMPTY MICRO-BATCH: every row malformed -> NO table gets a slice
    // (the old behavior landed a 1-row n_docs=0 stats partition with no
    // postings/doclen sibling, permanently blocking compaction)
    val allNull = docs.filter(col("doc_id") < 3)
      .select(col("doc_id"), lit(null).cast("string").as("text"))
    LexStream.indexBatchLex(spark, allNull, 0L, "lxc")
    Seq("postings", "doclen", "stats").foreach(t =>
      assert(!IndexOps.batchIdsOf(spark, s"lxc_$t").contains(0L),
        s"empty batch landed a $t slice"))

    // CROSS-TABLE SWAP CRASH: grow + tombstone, then simulate a crash
    // AFTER postings folded to the pending generation but BEFORE doclen
    // was compacted (the second table's rename window, with recoverSwap
    // having restored it) — the re-run must proceed, not refuse with a
    // misleading "drain the maintenance stream"
    LexStream.indexBatchLex(spark, docs.filter(col("doc_id") < 50)
      .select((col("doc_id") + 7000L).as("doc_id"), col("text")), 0L, "lxc")
    val drops = Seq(7001L, 7002L).toDF("doc_id")
    Lexical.tombstoneDocs(spark, "lxc", drops, batchId = 0L)
    val gen = IndexOps.maxBatchId(spark, "lxc_postings")
    IndexOps.compactTable(spark, "lxc_postings", s"$base/idx/postings",
      Seq("batch_id" -> "BIGINT"), "token", nBuckets = 8, gen,
      Some(spark.table("lxc_tombstones")), dropOn = "doc_id")
    assert(IndexOps.batchIdsOf(spark, "lxc_postings") == Set(gen) &&
      IndexOps.batchIdsOf(spark, "lxc_doclen").size > 1,
      "crash staging did not produce the half-compacted state")
    Lexical.compactLexIndex(spark, "lxc", s"$base/idx") // must not throw
    val survivors = docs.union(docs.filter(col("doc_id") < 50)
      .select((col("doc_id") + 7000L).as("doc_id"), col("text")))
      .join(drops, Seq("doc_id"), "left_anti")
    assert(sortedRows(Lexical.bm25TopKStored(spark, "lxc", terms)) ==
      rebuilt(survivors, "crashsurv"),
      "post-recovery compaction diverged from the rebuild")
    assert(IndexOps.batchIdsOf(spark, "lxc_doclen") == Set(gen))
    dropAll("lxc")
  }
}
