package graft.tools

import org.apache.spark.sql.SparkSession
import graft.streaming.{InboxGenerator, StreamIngest}

/** CLI demo of the stream plane: slice events into an inbox (the reference's
  * simulate_stream, made deterministic), then consume it as a Structured
  * Streaming job — watermarked tumbling agg → parquet, plus per-batch DQ.
  *
  * Usage: runMain graft.tools.RunStream <sfDir> <outBase>
  */
object RunStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val base  = args.lift(1).getOrElse("/tmp/graft_stream")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val files = InboxGenerator.generate(
      graft.Tables.events(spark, sfDir), s"$base/inbox", n = 5)
    println(s"inbox: ${files.size} micro-batches")

    // quarantine split first: corrupt rows carry NULL typed columns, which
    // the stateful consumer's non-nullable tuple encoder would reject
    val (src, _) = StreamIngest.quarantineCorrupt(
      StreamIngest.readInbox(spark, s"$base/inbox"))
    val q1 = StreamIngest.drainToParquet(
      StreamIngest.tumblingCounts(src), s"$base/hourly", s"$base/ckpt_hourly")
    val q2 = StreamIngest.drainWithDq(src, s"$base/dq", s"$base/ckpt_dq")
    q1.awaitTermination(); q2.awaitTermination()

    val out = spark.read.parquet(s"$base/hourly")
    println(s"hourly windows emitted: ${out.count()}")
    out.orderBy("bucket", "event_type").show(5, truncate = false)
    val arts = new java.io.File(s"$base/dq").listFiles()
    println(s"dq artifacts: ${if (arts == null) 0 else arts.length} batch dirs")

    // custom keyed state: running per-user totals via mapGroupsWithState
    val q3 = graft.streaming.StatefulOps.runningUserTotals(src)
      .writeStream.format("memory").queryName("user_totals")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q3.awaitTermination()
    val totals = spark.table("user_totals")
    println(s"stateful user totals: ${totals.select("user_id").distinct().count()} users")
    totals.orderBy(org.apache.spark.sql.functions.col("n_events").desc).show(5)

    // streaming embedding-index maintenance (round 12): seed a stored ANN
    // index on the late half of the embeddings, stream the early half in,
    // probe the standing index — retrieval sees streamed vectors without
    // any corpus re-encode
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(spark, sfDir)
    graft.operators.Similarity.buildAnnIndex(
      emb.filter(col("vec_id") >= 100), "demo_ann", s"$base/ann_idx")
    emb.filter(col("vec_id") < 100).select(col("vec_id"), col("embedding"))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/ann_inbox")
    val q4 = graft.streaming.AnnStream.maintainAnn(
      graft.streaming.AnnStream.readEmb(spark, s"$base/ann_inbox"),
      "demo_ann", s"$base/ckpt_ann")
    q4.awaitTermination()
    val hits = graft.operators.Similarity.annTopKBatchStored(
      spark, "demo_ann", batchSize = 4, k = 3)
    println(s"stored-ANN probe rows after streaming growth: ${hits.count()}")
    hits.orderBy(col("anchor_id"), col("rk")).show(6, truncate = false)

    // index lifecycle (round 13): a dedup-style DROP decision streams into
    // the standing index as tombstones (unretrievable from the next probe
    // on), then a generation compaction folds the batch partitions into
    // one and physically purges the deleted rows
    import spark.implicits._
    val victim = hits.orderBy(col("anchor_id"), col("rk"))
      .limit(1).collect()(0).getAs[Long]("vec_id")
    Seq(victim).toDF("vec_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/delete_inbox")
    val q5 = graft.streaming.AnnStream.maintainTombstones(
      graft.streaming.AnnStream.readDeletes(spark, s"$base/delete_inbox"),
      Seq("demo_ann"), s"$base/ckpt_del")
    q5.awaitTermination()
    val afterDelete = graft.operators.Similarity.annTopKBatchStored(
      spark, "demo_ann", batchSize = 4, k = 3)
    println(s"tombstoned vec_id=$victim still retrievable: " +
      afterDelete.filter(col("vec_id") === victim).count())
    // the maintenance loop, closed (round 16): ONE call reads the
    // policy decision the stored monitors imply, executes the decided
    // rewrite, and verifies the follow-up policy is healthy —
    // IndexOps.maintain is what an operator actually schedules. The
    // demo's single deletion is far below the production 10% bar, so
    // the demo lowers the bar to make the decision "compact" here.
    val filesBefore = spark.table("demo_ann_buckets").inputFiles.length
    println("maintenance (q176's policy + its executor) over the demo ANN index:")
    graft.operators.IndexOps.maintain(spark, "demo_ann", "ann_lsh",
      s"$base/ann_idx", tombstonePpmBar = 0L).show(truncate = false)
    val filesAfter = spark.table("demo_ann_buckets").inputFiles.length
    println(s"compaction via maintain: postings files $filesBefore -> $filesAfter, " +
      s"tombstones left: ${spark.table("demo_ann_tombstones").count()}, " +
      s"probe rows: ${graft.operators.Similarity.annTopKBatchStored(spark, "demo_ann", batchSize = 4, k = 3).count()}")

    // full lifecycle audit (round 14): one registered query runs
    // build → grow → tombstone → compact → drift-alert → refit over the
    // stored SQ8 family and returns the generation trail — the
    // operational story an operator reads first
    println("SQ8 lifecycle audit (q172):")
    graft.queries.Registry.byName("q172_sq8_lifecycle_audit")
      .fn(spark, sfDir).show(10, truncate = false)

    // stored lexical retrieval (round 14): BM25 and hybrid RRF against
    // the standing inverted index — build-once/query-many for the
    // lexical leg too, streamed docs retrievable next batch
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    graft.operators.Lexical.buildLexIndex(
      docs.filter(col("doc_id") >= 100), "demo_lex", s"$base/lex_idx")
    docs.filter(col("doc_id") < 100)
      .coalesce(1).write.mode("overwrite").parquet(s"$base/lex_inbox")
    val q7 = graft.streaming.LexStream.maintainLex(
      spark.readStream.schema(graft.streaming.DedupStream.docSchema)
        .parquet(s"$base/lex_inbox"),
      "demo_lex", s"$base/ckpt_lex")
    q7.awaitTermination()
    println("stored-BM25 top-5 after streaming growth:")
    graft.operators.Lexical.bm25TopKStored(
      spark, "demo_lex", graft.queries.DocQueries.bm25Terms, k = 5)
      .show(5, truncate = false)

    // streaming cardinality monitor (round 13): the inbox's user stream
    // grows a K-minimum-values sketch in O(K) state; the cumulative
    // estimate per batch is the dedup-health curve
    val q6 = graft.streaming.KmvStream.monitor(
      src.select(col("user_id").cast("long").as("k")), "k",
      s"$base/kmv_state", s"$base/kmv_mon", s"$base/ckpt_kmv")
    q6.awaitTermination()
    val mon = spark.read.parquet(s"$base/kmv_mon")
      .orderBy(col("batch_id"))
    println(s"KMV cardinality monitor rows: ${mon.count()}; exact distinct " +
      s"users: ${graft.Tables.events(spark, sfDir).select("user_id").distinct().count()}")
    mon.show(6, truncate = false)
    spark.stop()
  }
}
